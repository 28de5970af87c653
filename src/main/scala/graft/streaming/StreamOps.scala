package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-streaming operators (SURVEY.md §2.10). The reference snapshot
  * had micro-batch TimeWindow aggregation but no watermark (reference
  * StreamExecution.scala:174, TimeWindowing rule Analyzer.scala:2138); we
  * expose watermarking as the capability upgrade the 100 TB story needs for
  * bounded state.
  */
object StreamOps {

  private val sinkSeq = new AtomicInteger(0)

  /** Event-time 1-day tumbling window aggregation with a 2-hour watermark.
    * Money-ish sums in DECIMAL so results are bit-exact across engines and
    * partition orders. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv_dec"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("n"),
        col("sv_dec").cast("double").as("sv"))

  /** Run the windowed aggregation as a REAL stream over the events parquet
    * (FileStreamSource → MicroBatchExecution → memory sink), bounded by
    * Trigger.AvailableNow so it terminates when the backlog is drained.
    * `ts` arrives as INT64 nanos (legacy nanosAsLong read); integer-divide
    * to micros — a double division would lose precision at 1.7e18. */
  def runFileStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // FileStreamSource requires a directory to monitor; stage the fixture
    // file into one (in production the source IS a landing directory).
    val streamDir = java.nio.file.Paths.get("/root/repo/target/qtmp/events_stream")
    java.nio.file.Files.createDirectories(streamDir)
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      streamDir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val sink = s"graft_stream_sink_${sinkSeq.incrementAndGet()}"
    val raw = spark.readStream.schema(schema).parquet(streamDir.toString)
    val ev = raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val q = windowedAgg(ev).writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink).orderBy("w", "event_type")
  }

  /** Streaming exact dedup under at-least-once delivery: the landing
    * directory receives the SAME events file twice (duplicate redelivery),
    * and `dropDuplicatesWithinWatermark(event_id)` emits each event exactly
    * once — the streaming half of the pipeline dedup story. State is
    * bounded: ids older than the watermark are evicted, the non-negotiable
    * property for an unbounded 100 TB ingest (the batch-era reference kept
    * unbounded updateStateByKey state, PairDStreamFunctions.scala:397).
    * Returns the post-dedup per-type aggregate for the oracle compare
    * (aggregation runs in batch over the sink — one stateful op per
    * stream). */
  def runStreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val streamDir = java.nio.file.Paths.get("/root/repo/target/qtmp/events_dedup_stream")
    java.nio.file.Files.createDirectories(streamDir)
    for (copy <- Seq("events_a.parquet", "events_b.parquet")) {
      java.nio.file.Files.copy(java.nio.file.Paths.get(path),
        streamDir.resolve(copy),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val sink = s"graft_dedup_sink_${sinkSeq.incrementAndGet()}"
    val raw = spark.readStream.schema(schema).parquet(streamDir.toString)
    val deduped = raw
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .orderBy("event_type")
  }
}
