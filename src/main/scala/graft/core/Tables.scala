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

  // fixture frames are immutable read-only parquet, so the (session, path)
  // → DataFrame plan is reusable across queries — re-reading footers/file
  // listings per call was part of the bench floor. (A DataFrame holds its
  // session, so entries pin their key: bounded by the handful of sessions
  // a process creates, which is fine.)
  private val frames = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    frames.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(s"$dir/$name.parquet", p => spark.read.parquet(p))

  // One registration per (session, dir): the 10 parquet footer reads +
  // catalog calls cost ~0.5 s, and the bench sweep's per-query harness
  // floor was dominated by re-paying them for every SQL-path query in the
  // same session (r14 verdict item 8: ~290 s of a 556 s artifact was
  // floor). No query mutates a standard view name (they register their
  // OWN derived names), so a session that has registered `dir` once can
  // skip; switching dirs re-registers. Weak keys let sessions GC.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Register all tables as temp views for SQL-path queries (exercises the
    * parser/analyzer surface, SURVEY.md §3.1). Per-table isolation: one
    * unreadable table must not take down queries over the other nine. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) == dir) return
    names.foreach { n =>
      try apply(spark, dir, n).createOrReplaceTempView(n)
      catch { case e: Throwable =>
        System.err.println(s"[tables] skipping view $n: ${e.getMessage}")
      }
    }
    registered.put(spark, dir)
  }
}
