package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream/batch equivalence: the streamed windowed aggregation must produce
  * exactly the batch plan's result once the backlog drains (the reference's
  * StreamTest CheckAnswer pattern, adapted). */
class StreamOpsSpec extends SparkSpec {

  test("file-stream windowed agg equals batch windowed agg") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.runFileStream(spark, dir)
      .collect().map(_.toSeq).toSet

    val batch = graft.core.EventTime.toTimestamp(
      spark.read.parquet(s"$dir/events.parquet"))
    val expected = StreamOps.windowedAgg(batch)
      .collect().map(_.toSeq).toSet

    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }
}
