package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streamed CMS maintenance: per-batch grids must ADD to the batch-built
  * sketch — the mergeability property the operator exists for. */
class StreamSketchSpec extends SparkSpec {

  test("streamed grid equals the batch-built sketch exactly") {
    import spark.implicits._
    val root = graft.core.Scratch.dir("stream_sketch_spec")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val occ = (Seq.fill(30)("a") ++ Seq.fill(12)("b") ++ (1 to 20).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    // three uneven slices streamed as separate files
    Seq(occ.filter(col("id") % 3 === 0), occ.filter(col("id") % 3 === 1),
      occ.filter(col("id") % 3 === 2)).zipWithIndex.foreach { case (df, i) =>
      val stage = s"$root/stage_$i"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$stage/part-*")).head.getPath
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/landing"))
      val dst = new org.apache.hadoop.fs.Path(s"$root/landing/b$i.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
      fs.setTimes(dst, 1700000000000L + i * 60000, -1)
    }
    val stream = spark.readStream.schema(occ.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/landing")
      .select(col("k"))
    StreamSketch.start(stream, "k", s"$root/cms", d = 3, w = 32)
      .awaitTermination()
    val streamed = StreamSketch.read(spark, s"$root/cms").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.ops.Cms.sketch(occ, "k", 3, 32).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"grids diverged: ${(streamed.toSet diff batch.toSet).take(5)}")
    // REPLAY: wipe the checkpoint and re-run the whole stream against the
    // same store — every batch rewrites its own bid dir with identical
    // content, so the merged grid must NOT double-add.
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/cms-ckpt"), true)
    StreamSketch.start(stream, "k", s"$root/cms", d = 3, w = 32)
      .awaitTermination()
    val replayed = StreamSketch.read(spark, s"$root/cms").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(replayed == batch, "replay double-added into the grid")
    // COMPACTION: folding bids <= 1 into a base must not change the grid,
    // and re-running the same compaction (a simulated replay) is a no-op.
    StreamSketch.compact(spark, s"$root/cms", 1)
    StreamSketch.compact(spark, s"$root/cms", 1)
    val compacted = StreamSketch.read(spark, s"$root/cms").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(compacted == batch, "compaction changed the merged grid")
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/cms"))
      .map(_.getPath.getName).toSet
    assert(names.contains("base_upto=1") && !names.contains("bid=0") &&
      !names.contains("bid=1") && names.contains("bid=2"),
      s"unexpected store layout after compaction: $names")
  }

  test("weighted reservoir over batch splits equals the one-shot draw") {
    import spark.implicits._
    val root = graft.core.Scratch.dir("stream_wres_spec")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val rows = (0L until 200L).map(i => (i, 1L + i % 7)).toDF("doc_id", "wt")
    Seq(rows.filter(col("doc_id") % 3 === 0),
        rows.filter(col("doc_id") % 3 === 1),
        rows.filter(col("doc_id") % 3 === 2)).zipWithIndex.foreach {
      case (df, i) =>
        val stage = s"$root/stage_$i"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = fs.globStatus(
          new org.apache.hadoop.fs.Path(s"$stage/part-*")).head.getPath
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/landing"))
        val dst = new org.apache.hadoop.fs.Path(s"$root/landing/b$i.parquet")
        org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false,
          spark.sparkContext.hadoopConfiguration)
        fs.setTimes(dst, 1700000000000L + i * 60000, -1)
    }
    val stream = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/landing")
    StreamSketch.startWeightedReservoir(stream, "doc_id", "wt", "rs", 25,
      s"$root/res").awaitTermination()
    val streamed = StreamSketch.readReservoir(spark, s"$root/res", 25)
      .orderBy("skey", "rid").collect().map(_.getLong(0)).toSeq
    val batch = graft.pipeline.Sampling.weightedSample(rows, "wt", 25, "rs")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed == batch,
      s"reservoir diverged from the one-shot draw:\n$streamed\nvs\n$batch")
    // replay + compaction: the reservoir is as idempotent as the grid
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/res-ckpt"), true)
    StreamSketch.startWeightedReservoir(stream, "doc_id", "wt", "rs", 25,
      s"$root/res").awaitTermination()
    StreamSketch.compactReservoir(spark, s"$root/res", 1, 25)
    val replayed = StreamSketch.readReservoir(spark, s"$root/res", 25)
      .orderBy("skey", "rid").collect().map(_.getLong(0)).toSeq
    assert(replayed == batch, "replay/compaction changed the reservoir")
  }
}
