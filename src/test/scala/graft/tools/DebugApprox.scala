package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: which aggregate in q_approx costs what at sf0.1. */
object DebugApprox {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[debug] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rep = li.repartition(32, col("l_orderkey"))
    time("count")(rep.count())
    time("acd")(rep.agg(approx_count_distinct(col("l_partkey"))).collect())
    time("countDistinct")(rep.agg(countDistinct(col("l_partkey"))).collect())
    time("pct_approx acc=10000")(rep.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))).collect())
    time("pct_approx acc=1000")(rep.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000))).collect())
    time("percentile exact")(rep.agg(expr("percentile(l_quantity, 0.5)")).collect())
    time("median")(rep.agg(expr("median(l_quantity)")).collect())
    time("all combined (q_approx shape)")(
      rep.agg(
        (abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey")))
          <= countDistinct(col("l_partkey")) * 0.05).as("acd_ok"),
        (abs(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          - expr("percentile(l_quantity, 0.5)")) <= lit(2.0)).as("pct_ok")).collect())
    spark.stop()
  }
}
