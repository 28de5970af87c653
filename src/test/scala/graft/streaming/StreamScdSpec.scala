package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming SCD2 lifecycle: streamed batches equal batch application,
  * epochs flip atomically. */
class StreamScdSpec extends SparkSpec {

  test("two streamed change batches equal sequential batch application") {
    import spark.implicits._
    val root = graft.core.Scratch.dir("stream_scd_spec")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val dim = Seq(
      (1L, "east", "2024-01-01", null.asInstanceOf[String], true),
      (2L, "west", "2024-01-01", null.asInstanceOf[String], true)
    ).toDF("k", "region", "valid_from", "valid_to", "is_current")
    val b1 = Seq((1L, "north", "2024-03-01")).toDF("k", "region", "ts")
    val b2 = Seq((1L, "south", "2024-06-01")).toDF("k", "region", "ts")
    Seq(b1 -> 0, b2 -> 1).foreach { case (df, i) =>
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
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/landing")
    StreamScd.start(stream, dim, s"$root/dim", "k", Seq("region"), "ts")
      .awaitTermination()
    val got = StreamScd.readDim(spark, s"$root/dim")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "east", Some("2024-03-01"), false),
      (1L, "north", Some("2024-06-01"), false),
      (1L, "south", None, true),
      (2L, "west", None, true)))
    // both epochs exist; the pointer names the latest — a crash between
    // epoch write and flip would leave readers on the previous epoch
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/dim/epoch_0")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/dim/epoch_1")))
    val epoch0 = spark.read.parquet(s"$root/dim/epoch_0")
    assert(epoch0.filter(col("is_current") && col("k") === 1)
      .collect()(0).getString(1) == "north", "previous epoch stays readable")
  }
}
