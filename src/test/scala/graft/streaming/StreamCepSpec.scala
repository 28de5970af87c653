package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** StreamCep: the pattern state must CROSS micro-batch boundaries, the
  * negation must block, and the strict-past rule must hold. */
class StreamCepSpec extends SparkSpec {

  private def run(events: Seq[(Long, Long, String, Long)],
                  split: Long): Map[Long, Long] = {
    import spark.implicits._
    val root = graft.core.Scratch.dir("cep_spec")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val ev = events.toDF("event_id", "user_id", "event_type", "ts")
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val stageDir = s"$root/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stageDir)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
      val dst = new org.apache.hadoop.fs.Path(s"$root/landing/$name.parquet")
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/landing"))
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
      fs.setTimes(dst, mtime, -1)
    }
    stage(ev.filter(col("ts") < split), "batch0", 1700000000000L)
    stage(ev.filter(col("ts") >= split), "batch1", 1700000060000L)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/landing")
    StreamCep.start(stream, s"$root/out", windowUs = 100L)
      .awaitTermination()
    StreamCep.read(spark, s"$root/out").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("state crosses the batch boundary; negation and window block") {
    // user 1: click@10 (batch0) -> purchase@50 (batch1): MATCH across
    //   the boundary, gap 0 sec (40 us)
    // user 2: click@10, error@20, purchase@50: error after click blocks
    // user 3: click@10, purchase@200: outside the 100 us window
    // user 4: purchase@50 with no click: no match
    // user 5: error@5, click@10, purchase@50: error BEFORE click is fine
    val split = 30L
    val got = run(Seq(
      (1L, 1L, "click", 10L), (2L, 1L, "purchase", 50L),
      (3L, 2L, "click", 10L), (4L, 2L, "error", 20L),
      (5L, 2L, "purchase", 50L),
      (6L, 3L, "click", 10L), (7L, 3L, "purchase", 200L),
      (8L, 4L, "purchase", 50L),
      (9L, 5L, "error", 5L), (10L, 5L, "click", 10L),
      (11L, 5L, "purchase", 50L)), split)
    assert(got.keySet == Set(2L, 11L), got.toString)
  }

  test("strict past: a click at the same instant does not qualify itself") {
    // purchase processed before the click updates state at equal ts —
    // (ts, event_id) order puts the click (lower id) first, so the
    // purchase AT the same ts with higher id DOES see it: gap 0. The
    // strict-past rule is about the current event, matching the batch
    // window's UNBOUNDED PRECEDING..1 PRECEDING frame.
    val got = run(Seq(
      (1L, 9L, "click", 40L), (2L, 9L, "purchase", 40L)), 30L)
    assert(got == Map(2L -> 0L), got.toString)
  }
}
