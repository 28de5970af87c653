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
  // listings per call was part of the bench floor. Only the DEFAULT
  // session is cached: a DataFrame strongly references its session, so a
  // weak key can never evict its own entry — fine for the one long-lived
  // session, but queries that spin `newSession()` per invocation (e.g.
  // q_fts_skew_serving's conf-isolated session) would pin a SessionState
  // per bench iteration without bound. Non-default sessions just re-read.
  //
  // IMMUTABILITY ASSUMPTION: a cached entry snapshots the parquet file
  // listing at first access. Corpus dirs read through Tables must not be
  // rewritten in-JVM afterwards — tools that regenerate a corpus under
  // the same path (ScaleCorpus overwrite) must call [[invalidate]] after
  // the write, or cached plans point at deleted files.
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = s"$dir/$name.parquet"
    if (SparkSession.getDefaultSession.exists(_ eq spark))
      // compute() (not computeIfAbsent): a suite that stops the default
      // session and builds a new one must not be served a frame bound to
      // the dead session — revalidate the cached frame's own session
      frames.compute(p, (pp, cached) =>
        if (cached != null && (cached.sparkSession eq spark)) cached
        else spark.read.parquet(pp))
    else spark.read.parquet(p)
  }

  /** Drop ALL in-JVM state derived from `dir`'s content — required after
    * any in-JVM rewrite of a corpus dir that was already read through
    * [[apply]]. Three layers, because each caches independently:
    * cached frames (stale file listings), the registered-views memo
    * (temp views hold analyzed plans over the stale frames), and the
    * dir-md5-keyed served layouts (trained embedding spaces, FTS serving
    * index/df stats, bucketed edge layouts — [[Scratch.registerLayout]])
    * whose keys hash the PATH, not the content, and would otherwise keep
    * serving state trained on the old corpus with no error. */
  def invalidate(dir: String): Unit = {
    frames.keySet.removeIf(_.startsWith(s"$dir/"))
    registered.synchronized {
      registered.entrySet().removeIf(_.getValue == dir)
    }
    Scratch.invalidateLayouts(dir)
  }

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
    // only mark the session registered when EVERY view registered — a
    // transient read failure must re-attempt on the next call, not leave
    // the view permanently missing for the session's lifetime
    val allOk = names.forall { n =>
      try { apply(spark, dir, n).createOrReplaceTempView(n); true }
      catch { case e: Throwable =>
        System.err.println(s"[tables] skipping view $n: ${e.getMessage}")
        false
      }
    }
    if (allOk) registered.put(spark, dir)
  }
}
