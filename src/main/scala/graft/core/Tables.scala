package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Mirrors the reference's table-from-parquet entry path
  * (sql/core/.../datasources/parquet/ParquetFileFormat.scala:60) via the
  * Spark 4 built-in vectorized parquet scan. At cluster scale the same code
  * reads partitioned/bucketed directories; nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views for SQL-path queries (exercises the
    * parser/analyzer surface, SURVEY.md §3.1). Per-table isolation: one
    * unreadable table must not take down queries over the other nine. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      try apply(spark, dir, n).createOrReplaceTempView(n)
      catch { case e: Throwable =>
        System.err.println(s"[tables] skipping view $n: ${e.getMessage}")
      }
    }
}
