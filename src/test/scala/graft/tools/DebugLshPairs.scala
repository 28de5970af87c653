package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: LSH candidate-pair MASS (Σ C(bucket, 2) over (band, bh)
  * buckets) of the minhash pipeline at a given corpus dir — separates
  * "the corpus grew its true pair count" from "the engine went
  * superlinear" when reading ScaleSpot ratios for q_dedup_minhash. */
object DebugLshPairs {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    graft.ext.GraftExtensions.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val sets = graft.pipeline.Dedup.shingleSets(
        spark.read.parquet(s"$dir/documents.parquet"))
      val banded = graft.pipeline.Dedup.bandKeys(sets)
      val mass = banded.groupBy("band", "bh").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).as("pairs"),
          max(col("c")).as("max_bucket"), count(lit(1)).as("buckets"))
        .collect()(0)
      println(s"LSH_MASS dir=$dir pairs=${mass.get(0)} " +
        s"max_bucket=${mass.get(1)} buckets=${mass.get(2)}")
      sets.unpersist()
    }
    spark.stop()
  }
}
