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
    * `ts` is normalized to a real timestamp by [[graft.core.EventTime]]
    * (schema-dispatched — the fixture has shipped both INT64-nanos and
    * TIMESTAMP_NTZ vintages). */
  def runFileStream(spark: SparkSession, dir: String): DataFrame = {
    // FileStreamSource requires a directory to monitor; stage the fixture
    // file into one (in production the source IS a landing directory).
    val ev = eventsStream(spark, dir, graft.core.Scratch.dir("events_stream"))
    val sink = s"graft_stream_sink_${sinkSeq.incrementAndGet()}"
    val q = windowedAgg(ev).writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink).orderBy("w", "event_type")
  }

  /** Stage the events fixture file into a fresh landing directory and
    * return the file-stream DataFrame over it (ts normalized to a real
    * timestamp, whatever the fixture vintage). */
  private def eventsStream(spark: SparkSession, dir: String,
                           landing: String, copies: Int = 1): org.apache.spark.sql.DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // wipe the landing dir: leftovers from a previous run (other sf dir,
    // other copy count) would stream extra rows into the sink
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(landing), true)
    val streamDir = java.nio.file.Paths.get(landing)
    java.nio.file.Files.createDirectories(streamDir)
    // fixture = one FILE; a Spark-written events table (ScaleCorpus ×N
    // replicas) = a DIRECTORY of part files — stage either shape
    val src = java.nio.file.Paths.get(path)
    val parts =
      if (java.nio.file.Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        // Using closes the directory stream (Files.list holds an fd open)
        scala.util.Using.resource(java.nio.file.Files.list(src)) { st =>
          st.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        }
      } else Seq(src)
    require(parts.nonEmpty, s"no parquet files to stage under $path")
    for (i <- 1 to copies; (p, j) <- parts.zipWithIndex) {
      java.nio.file.Files.copy(p,
        streamDir.resolve(f"events_${i}_$j%05d.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    graft.core.EventTime.toTimestamp(
      spark.readStream.schema(schema).parquet(streamDir.toString))
  }

  /** Stream-static join: the event stream enriched against a static
    * dimension (customer) — the standard production lookup-join; Spark
    * plans it as a per-micro-batch broadcast join with no stream state.
    * Joined rows land in the sink; aggregation runs in batch over it. */
  def runStreamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir, graft.core.Scratch.dir("events_join_stream"))
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val sink = s"graft_sjoin_sink_${sinkSeq.incrementAndGet()}"
    val q = ev.join(dim, ev("user_id") === dim("c_custkey"))
      .select(col("event_type"), col("c_mktsegment"), col("value"))
      .writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .orderBy("c_mktsegment", "event_type")
  }

  /** STREAM-STREAM interval join — the capability the stream-static lookup
    * can't cover: both sides arrive over time, so the join keeps per-side
    * state and the event-time range condition + watermarks bound it (a
    * click's state is droppable once the purchase-side watermark passes
    * c_ts + 1 hour — without the range bound the state grows forever).
    * Inner join: emitted rows are exactly the batch join's rows, so the
    * DuckDB batch oracle applies directly. */
  def runStreamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val clicks =
      eventsStream(spark, dir, graft.core.Scratch.dir("events_ssj_clicks"))
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
    val purchases =
      eventsStream(spark, dir, graft.core.Scratch.dir("events_ssj_purchases"))
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
        .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
    val sink = s"graft_ssj_sink_${sinkSeq.incrementAndGet()}"
    val q = joined.select(col("c_user"), col("value"))
      .writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .orderBy("user_id")
  }

  /** Custom streaming state end-to-end: per-user running (count, max)
    * through mapGroupsWithState over the file stream; Update mode with a
    * single AvailableNow batch emits exactly one snapshot per user. */
  /** [[Stateful.gapFillHours]] end-to-end: events (user_id < 10) staged as
    * TWO event-time-ordered micro-batches split ON AN HOUR BOUNDARY
    * (2024-01-16 00:00 UTC — the bucket-aligned split the operator's
    * arrival contract requires, so no bucket's sum straddles batches),
    * then the stateful LOCF emits every grid hour exactly once; gap rows
    * crossing the batch cut are produced in batch 1 from batch 0's
    * carried state — the cross-batch behavior under test. Result ==
    * the batch GapFill.fillForward (the oracle replays that). */
  def runStreamGapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val landing = graft.core.Scratch.dir("events_gapfill_stream")
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(landing), true)
    // schema-portable: ts may land as nanos BIGINT, TIMESTAMP_NTZ, or
    // TIMESTAMP depending on the fixture vintage — normalize first
    val ev = graft.core.EventTime.toTimestamp(
      spark.read.parquet(s"$dir/events.parquet").filter(col("user_id") < 10))
    val cut = expr("TIMESTAMP'2024-01-16 00:00:00'")
    def stage(df: DataFrame, name: String, mtime: Long): Unit = {
      val stageDir = s"$landing/../stage_gapfill_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stageDir)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
      fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
      val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
      fs.setTimes(dst, mtime, -1)
    }
    val t0 = 1700000000000L
    stage(ev.filter(col("ts") < cut), "batch0", t0)
    stage(ev.filter(col("ts") >= cut), "batch1", t0 + 60000)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    val obs = stream.select(col("user_id"),
        expr("unix_seconds(ts) DIV 3600").as("hour"),
        col("value"))
      .as[HourObs]
    val sink = s"graft_gapfill_sink_${sinkSeq.incrementAndGet()}"
    val q = Stateful.gapFillHours(obs).writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
      .select(col("user_id"),
        date_format(timestamp_seconds(col("hour") * 3600L),
          "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("value"), col("filled"))
      .orderBy("user_id", "ws")
  }

  def runStreamStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir, graft.core.Scratch.dir("events_state_stream"))
      .select(col("user_id"), col("event_type"), col("value"))
      .as[UserEvent]
    val sink = s"graft_state_sink_${sinkSeq.incrementAndGet()}"
    val q = Stateful.runningActivity(ev).writeStream
      .format("memory").queryName(sink)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Update mode emits one snapshot per touched user PER BATCH; snapshots
    // are monotone (count grows, max never shrinks), so folding with max
    // yields the final state even if the source ever splits into several
    // micro-batches instead of today's single-file batch.
    spark.table(sink)
      .groupBy("user_id")
      .agg(max(col("events")).as("events"), max(col("max_value")).as("max_value"))
      .orderBy("user_id")
  }

  /** [[Stateful.runningActivityTws]] end-to-end: the transformWithState
    * (state API v2) flavour of [[runStreamStateful]]. The API requires the
    * RocksDB state store provider; set it for this query and restore the
    * session default after, so the HDFS-backed provider keeps serving the
    * other streaming queries unchanged. */
  def runStreamTws(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, dir, graft.core.Scratch.dir("events_tws_stream"))
      .select(col("user_id"), col("event_type"), col("value"))
      .as[UserEvent]
    val sink = s"graft_tws_sink_${sinkSeq.incrementAndGet()}"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Stateful.runningActivityTws(ev).writeStream
        .format("memory").queryName(sink)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    spark.table(sink)
      .groupBy("user_id")
      .agg(max(col("events")).as("events"), max(col("max_value")).as("max_value"))
      .orderBy("user_id")
  }

  /** Streaming ETL through the TRANSACTIONAL parquet file sink: stream →
    * filter/project → parquet + checkpoint, then read the output back.
    * Exactly-once comes from the sink's `_spark_metadata` commit log (the
    * batch reader lists committed files through it, so a torn task can
    * never surface partial output) — at 100 TB this is the landing-zone
    * pattern: no rename-based commit, no duplicate files after retries.
    * Non-aggregated append keeps the pipeline free of the watermark-
    * emission coupling (aggregates run in batch over the committed
    * output). Output + checkpoint dirs are wiped first so the query is
    * idempotent per run. */
  def runStreamFileSink(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("events_filesink_out")
    val ckpt = graft.core.Scratch.dir("events_filesink_ckpt")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(out, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    val ev = eventsStream(spark, dir, graft.core.Scratch.dir("events_filesink_stream"))
    val q = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
      .groupBy(col("user_id") % 10 as "user_bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .orderBy("user_bucket")
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
    val deduped =
      eventsStream(spark, dir, graft.core.Scratch.dir("events_dedup_stream"), copies = 2)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("event_id")
    val sink = s"graft_dedup_sink_${sinkSeq.incrementAndGet()}"
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
