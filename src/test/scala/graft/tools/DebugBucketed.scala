package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing for the bucketed-table write + join (not part of the
  * driver contract). */
object DebugBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("write lineitem bucketed") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", graft.core.Scratch.dir("lineitem_bucketed"))
        .saveAsTable("lineitem_bucketed")
    }
    time("write orders bucketed") {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", graft.core.Scratch.dir("orders_bucketed"))
        .saveAsTable("orders_bucketed")
    }
    time("join + agg") {
      val l = spark.table("lineitem_bucketed")
      val o = spark.table("orders_bucketed")
      l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
