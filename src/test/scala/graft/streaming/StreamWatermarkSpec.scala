package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Row for the MemoryStream watermark batches (top-level: nested case
  * classes break encoder codegen at runtime). */
case class WmEvent(ts: Timestamp, event_type: String, value: Double)

/** Watermark LATE-DATA EVICTION, pinned at row granularity: a late row
  * whose value would visibly shift its window's sum must be DROPPED once
  * the watermark has passed, and the streamed result must equal the
  * batch aggregation over the ON-TIME subset only — never the full
  * input. (The oracle row q_stream_watermark_late proves the same
  * contract over the events fixture; this spec controls batch boundaries
  * and the late row exactly.) */
class StreamWatermarkSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("a late row drops at the watermark; result equals the on-time batch") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext

    val onTime = Seq(
      WmEvent(ts("2024-01-01T10:00:00Z"), "click", 1.0),
      WmEvent(ts("2024-01-01T11:00:00Z"), "click", 2.0),
      WmEvent(ts("2024-01-01T12:00:00Z"), "view", 5.0),
      WmEvent(ts("2024-01-02T23:30:00Z"), "click", 7.0))
    // event time a full day behind the watermark (Jan 2 21:30 after
    // batch 0) — its 100.0 would be unmissable in the Jan 1 click sum
    val late = WmEvent(ts("2024-01-01T05:00:00Z"), "click", 100.0)
    // advances the watermark past Jan 3 so the Jan 2 window also closes
    val closer = WmEvent(ts("2024-01-04T02:30:00Z"), "view", 9.0)

    val input = MemoryStream[WmEvent]
    val sink = s"wm_spec_sink_${System.nanoTime()}"
    val q = StreamOps.windowedAgg(input.toDF()).writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    input.addData(onTime: _*)
    q.processAllAvailable()
    input.addData(late, closer)
    q.processAllAvailable()
    // one more empty pass lets the advanced watermark finalize windows
    input.addData()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(sink)
      .select("w", "event_type", "n", "sv")
      .collect().map(_.toSeq).toSet
    val expected = Set(
      Seq("2024-01-01 00:00:00", "click", 2L, 3.0),
      Seq("2024-01-01 00:00:00", "view", 1L, 5.0),
      Seq("2024-01-02 00:00:00", "click", 1L, 7.0))
    assert(streamed == expected,
      s"late row must drop and closed windows must match on-time batch; got $streamed")

    // the same closed windows computed in BATCH over the on-time subset
    val batch = StreamOps.windowedAgg(
        (onTime :+ closer).toDF().withColumn("ts", col("ts")))
      .filter(col("w") < "2024-01-03")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "streamed must equal the on-time batch twin")
    assert(!streamed.exists(_.contains(103.0)) &&
           !streamed.exists(_.contains(100.0)),
      "the late row's value leaked into a sum")
  }
}
