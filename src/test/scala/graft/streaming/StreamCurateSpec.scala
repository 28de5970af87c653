package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.pipeline.Dedup

/** Streamed decontamination must equal the batch scrub over the same
  * corpus — per-doc against a fixed benchmark, so batch-decomposable. */
class StreamCurateSpec extends SparkSpec {

  test("streamed scrub over two batches == batch decontaminate") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val corpus = Seq(
      (1L, base),                 // == bench doc → contaminated
      (2L, base + " extraword"),  // near-dup of bench → contaminated
      (3L, "totally different content about spark engines and queries"),
      (4L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed"),
      (5L, base + " tail")        // arrives in batch 2, also near-dup
    )
    val bench = Seq((100L, base)).toDF("doc_id", "text")

    val out = graft.core.Scratch.dir("stream_curate_spec")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData(corpus.take(3): _*)
    StreamCurate.startDecontaminated(stream, bench, out).awaitTermination()
    input.addData(corpus.drop(3): _*)
    StreamCurate.startDecontaminated(stream, bench, out).awaitTermination()

    val streamed = StreamCurate.read(spark, out)
      .collect().map(_.getLong(0)).toSet
    val batch = Dedup.decontaminate(corpus.toDF("doc_id", "text"), bench)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed == Set(3L, 4L), "near-dups of the benchmark must be gone")
  }
}
