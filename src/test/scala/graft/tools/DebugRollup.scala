package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: minimal repro of the rollup+window ambiguity in q_join_ds67. */
object DebugRollup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq(("a", "x", 1, 10.0), ("a", "y", 1, 5.0), ("b", "x", 2, 3.0))
      .toDF("p_type", "p_brand", "o_year", "amt")
    def attempt(label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      try { f.collect(); println(s"OK   $label") }
      catch { case e: Exception =>
        println(s"FAIL $label -> ${e.getMessage.take(120)}")
        e.getStackTrace.take(18).foreach(f => println(s"  at $f")) }
    attempt("rollup+grouping only") {
      df.rollup("p_type", "p_brand", "o_year")
        .agg(sum(col("amt")).as("s"),
          grouping(col("p_type")).cast("int").as("g1"))
    }
    attempt("rollup+grouping+window") {
      df.rollup("p_type", "p_brand", "o_year")
        .agg(sum(col("amt")).as("s"),
          grouping(col("p_type")).cast("int").as("g1"))
        .toDF("gt", "gb", "gy", "s", "g1")
        .withColumn("rk", rank().over(org.apache.spark.sql.expressions
          .Window.partitionBy(col("gt")).orderBy(col("s").desc)))
    }
    // the Verify environment: graft extensions installed + real tables
    val dir = "/root/testdata/sf0.01"
    def full(): org.apache.spark.sql.DataFrame = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val part = spark.read.parquet(s"$dir/part.parquet")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .select(col("p_type"), col("p_brand"),
          year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,2)")).as("amt"))
        .toDF("p_type", "p_brand", "o_year", "amt")
        .rollup("p_type", "p_brand", "o_year")
        .agg(sum(col("amt")).cast("double").as("sumsales"),
          grouping(col("p_type")).cast("int").as("g1"))
        .toDF("gtype", "gbrand", "gyear", "sumsales", "g1")
        .withColumn("rk", rank().over(org.apache.spark.sql.expressions
          .Window.partitionBy(col("gtype")).orderBy(col("sumsales").desc)))
        .filter(col("rk") <= 3)
    }
    attempt("full WITHOUT extensions")(full())
    graft.ext.GraftExtensions.install(spark)
    attempt("full with extensions")(full())
    spark.stop()
  }
}
