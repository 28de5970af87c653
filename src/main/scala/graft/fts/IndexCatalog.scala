package graft.fts

import java.util.concurrent.ConcurrentHashMap

/** Registry of persisted full-text indexes, keyed by (canonical path of
  * the indexed table, indexed column) — a table can carry one index per
  * text column. [[graft.ext.RewriteFtsMatch]] consults it during
  * optimization: a `fts_match` predicate over a registered table is lowered
  * to a left-semi join against the index's bucketed postings (the scan then
  * partition-prunes to the query terms' buckets) instead of a full-corpus
  * re-tokenize — the graft analogue of the reference's metastore-backed
  * table→index association (its catalog keeps per-table properties,
  * sql/hive/.../HiveExternalCatalog.scala:214).
  *
  * Keys are normalized to the bare URI path so `spark.read.parquet(p)`
  * root paths (`file:/...`) and user-supplied strings (`/...`) agree.
  */
object IndexCatalog {

  /** A persisted index produced by [[Index.write]]: where it lives, which
    * columns of the indexed table are the document id / indexed text, and
    * the bucket count the postings were partitioned with (must match the
    * writer's). The rewrite only fires for `fts_match` over `textCol` —
    * the index carries that column's tokens and no other's.
    * `positional` records whether the postings carry per-doc position lists
    * ([[Index.buildPositional]]) — the rewrite lowers `fts_phrase`/`fts_near`
    * to pure index plans only when they do.
    * `fingerprint` is the indexed table's file listing at registration time
    * ([[tableFingerprint]]); [[get]] re-checks it so a table rewritten after
    * indexing falls back to the scan lowering instead of silently
    * semi-joining stale postings.
    * `analyzer` is the configured analysis pipeline the index was built
    * with (empty = frozen v1 grammar): the rewrite normalizes query terms
    * through it, and predicates it cannot answer fall back to scan
    * semantics. */
  final case class Entry(indexDir: String, idCol: String, textCol: String,
                         buckets: Int, positional: Boolean, fingerprint: Long,
                         reversed: Boolean = false,
                         analyzer: AnalyzerConfig = AnalyzerConfig())

  // keyed by (canonical table path, lowercased indexed column): one table
  // can carry several indexes — title + body is the first thing a document
  // search user asks for — and a second column's registration must not
  // overwrite the first's
  private val byPathCol = new ConcurrentHashMap[(String, String), Entry]()

  /** Per-(session, indexDir) cache of the persisted index's DataFrames:
    * `spark.read.parquet` LISTS the directory at construction, and the
    * rewrite needs the postings handle on every optimizer pass — without
    * the cache every query re-pays a file listing during planning
    * (planning latency only, but real on object stores). Invalidated by
    * [[register]] (an index rewrite registers again) and [[clear]]. */
  private val ixCache = new ConcurrentHashMap[String, (AnyRef, FtsIndex)]()

  /** The entry's persisted index handle, cached per (session, indexDir).
    * Every call returns FRESH output exprIds over the SAME cached relation
    * (file listing paid once): one query may graft the postings in as
    * several subplans — scoring join + candidate semi-join, or two
    * fts_score queries — and shared exprIds across join sides would make
    * the plan ambiguous. */
  def cachedIndex(spark: org.apache.spark.sql.SparkSession,
                  entry: Entry): FtsIndex = {
    val base = ixCache.compute(entry.indexDir, (_, cur) =>
      if (cur != null && (cur._1 eq spark)) cur
      else (spark, Index.read(spark, entry.indexDir, entry.buckets)))._2
    import org.apache.spark.sql.GraftColumnBridge.freshCopy
    FtsIndex(freshCopy(base.postings), freshCopy(base.docLens),
      freshCopy(base.stats))
  }

  /** Order-independent hash of the table's data files (path, length,
    * mtime) — any rewrite, compaction, append, or delete changes it. One
    * metadata listing per call: trivial on a filesystem, and on an object
    * store it is the same LIST the subsequent scan planning issues anyway
    * (cache with a TTL there if the optimizer-time LIST ever shows up in
    * profiles). `_`-prefixed bookkeeping files (_SUCCESS) are skipped, same
    * as Spark's own file-index listing. */
  def tableFingerprint(tablePath: String): Long = {
    val path = new org.apache.hadoop.fs.Path(tablePath)
    // the SESSION's hadoop conf, not a bare new Configuration(): filesystem
    // credentials/settings supplied via spark.hadoop.* (object stores)
    // would otherwise make the listing throw — and get()'s staleness guard
    // would silently deregister the index on that throw
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = path.getFileSystem(conf)
    var acc = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) {
        val h = scala.util.hashing.MurmurHash3.stringHash(
          s"${f.getPath}#${f.getLen}#${f.getModificationTime}")
        acc ^= (h.toLong << 32) | (Integer.rotateLeft(h, 13).toLong & 0xffffffffL)
      }
    }
    acc
  }

  /** Scheme-qualified canonical key: `file:///x` and `/x` agree (local paths
    * default to the file scheme), but distinct filesystems/buckets —
    * `s3a://bucketA/corpus` vs `s3a://bucketB/corpus` vs `hdfs://nn/corpus`
    * — stay distinct keys; a bare-path key would silently alias them and
    * semi-join against the wrong index. */
  private def canon(p: String): String = {
    val uri = new org.apache.hadoop.fs.Path(p).toUri
    val scheme = Option(uri.getScheme).getOrElse("file")
    val authority = Option(uri.getAuthority).getOrElse("")
    s"$scheme://$authority${uri.getPath}"
  }

  def register(tablePath: String, indexDir: String,
               idCol: String = "doc_id", textCol: String = "text",
               buckets: Int = 64, positional: Boolean = false,
               reversed: Boolean = false,
               analyzer: AnalyzerConfig = AnalyzerConfig()): Unit = {
    ixCache.remove(indexDir) // a re-register means the index was rewritten
    byPathCol.put((canon(tablePath), textCol.toLowerCase(java.util.Locale.ROOT)),
      Entry(indexDir, idCol, textCol, buckets, positional,
        tableFingerprint(tablePath), reversed, analyzer))
  }

  /** Name of the metadata file [[Index.createIndex]] drops inside the index
    * directory — the association + build-time fingerprint, so a NEW session
    * can [[restore]] the registration without rebuilding (the warehouse
    * pattern: index metadata travels with the index, like the reference's
    * table properties in its external catalog,
    * sql/hive/.../HiveExternalCatalog.scala:214). */
  val MetaFile = "_graft_index.properties"

  /** Persist the association alongside the index itself. */
  def writeMeta(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                indexDir: String, idCol: String, textCol: String,
                buckets: Int, positional: Boolean = false,
                reversed: Boolean = false,
                analyzer: AnalyzerConfig = AnalyzerConfig()): Unit = {
    val props = new java.util.Properties()
    props.setProperty("tablePath", canon(tablePath))
    props.setProperty("idCol", idCol)
    props.setProperty("textCol", textCol)
    props.setProperty("buckets", buckets.toString)
    props.setProperty("positional", positional.toString)
    props.setProperty("reversed", reversed.toString)
    if (!analyzer.isV1) props.setProperty("analyzer", analyzer.describe)
    props.setProperty("fingerprint", tableFingerprint(tablePath).toString)
    val p = new org.apache.hadoop.fs.Path(indexDir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try props.store(out, "graft index registration")
    finally out.close()
  }

  /** Remove the metadata file (if any) — called before a rebuild rewrites
    * the layout, so a crash mid-write can never leave stale metadata
    * marking a half-overwritten index as complete. */
  def deleteMeta(spark: org.apache.spark.sql.SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir, MetaFile)
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, false)
    } catch { case _: Throwable => () } // best-effort; rebuild overwrites anyway
  }

  /** Does a COMPLETE, CURRENT index with exactly these build parameters
    * already sit at `indexDir`? True iff the metadata file (written LAST
    * by [[Index.createIndex]], so its presence marks a complete layout)
    * exists, every build parameter matches, and the stored build-time
    * fingerprint equals the table's CURRENT file listing — i.e. rebuilding
    * would byte-identically reproduce what is already there. Lets
    * createIndex skip the rebuild (guide §1.2: don't recompute what you
    * already have); any append/rewrite/param change fails the check and
    * rebuilds as before. */
  def metaMatches(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                  indexDir: String, idCol: String, textCol: String,
                  buckets: Int, positional: Boolean, reversed: Boolean,
                  analyzer: AnalyzerConfig): Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexDir, MetaFile)
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) return false
      val in = fs.open(p)
      val props = new java.util.Properties()
      try props.load(in) finally in.close()
      props.getProperty("tablePath") == canon(tablePath) &&
        props.getProperty("idCol") == idCol &&
        props.getProperty("textCol") == textCol &&
        props.getProperty("buckets") == buckets.toString &&
        props.getProperty("positional", "false") == positional.toString &&
        props.getProperty("reversed", "false") == reversed.toString &&
        Option(props.getProperty("analyzer")) ==
          (if (analyzer.isV1) None else Some(analyzer.describe)) &&
        Option(props.getProperty("fingerprint")).contains(
          tableFingerprint(tablePath).toString)
    } catch { case _: Throwable => false } // unreadable meta = rebuild
  }

  /** Re-register a persisted index from its own metadata file — the stored
    * BUILD-TIME fingerprint is kept, so if the table changed since the
    * index was built, [[get]] still detects the staleness and the rewrite
    * falls back to the scan lowering (re-fingerprinting here would wrongly
    * bless a stale index as fresh). */
  def restore(spark: org.apache.spark.sql.SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    byPathCol.put(
      (props.getProperty("tablePath"),
        props.getProperty("textCol").toLowerCase(java.util.Locale.ROOT)),
      Entry(indexDir, props.getProperty("idCol"), props.getProperty("textCol"),
        props.getProperty("buckets").toInt,
        // absent in pre-positional metadata files → false
        props.getProperty("positional", "false").toBoolean,
        props.getProperty("fingerprint").toLong,
        props.getProperty("reversed", "false").toBoolean,
        Option(props.getProperty("analyzer"))
          .map(AnalyzerConfig.parse).getOrElse(AnalyzerConfig())))
  }

  /** Freshness-check TTL in ms. 0 (default) = re-list the table's files on
    * every optimizer pass — correctness-first staleness detection. On an
    * object store with millions of files that LIST is real planning
    * latency; set a small TTL (e.g. 30000) to amortize it across queries,
    * accepting a ≤ TTL window in which a just-rewritten table could still
    * be answered from the old index. */
  @volatile var freshnessTtlMs: Long = 0L

  private val lastChecked = new ConcurrentHashMap[String, java.lang.Long]()

  /** ALL fresh entries for `tablePath` (one per indexed column, textCol
    * order for determinism). Freshness is per table: one listing checks
    * every entry's stored fingerprint — an entry whose fingerprint differs
    * (table rewritten after indexing) is dropped so callers fall back to
    * non-index semantics. Within [[freshnessTtlMs]] of the last successful
    * check the listing is skipped. */
  def entriesFor(tablePath: String): Seq[Entry] = {
    val key = canon(tablePath)
    import scala.jdk.CollectionConverters._
    val es = byPathCol.asScala.filter(_._1._1 == key).toSeq
    if (es.isEmpty) Nil
    else {
      val now = System.currentTimeMillis()
      val recent = freshnessTtlMs > 0 &&
        Option(lastChecked.get(key)).exists(now - _ < freshnessTtlMs)
      val fp: Option[Long] =
        if (recent) None // all entries passed within the TTL
        else scala.util.Try(tableFingerprint(tablePath)).toOption
      val (fresh, stale) =
        if (recent) (es, Nil)
        else es.partition { case (_, e) => fp.contains(e.fingerprint) }
      stale.foreach { case (k, e) => byPathCol.remove(k, e) }
      if (!recent) {
        if (stale.isEmpty && fresh.nonEmpty) lastChecked.put(key, now)
        else lastChecked.remove(key)
      }
      fresh.map(_._2).sortBy(_.textCol)
    }
  }

  /** The first fresh entry for `tablePath` (single-index convenience). */
  def get(tablePath: String): Option[Entry] = entriesFor(tablePath).headOption

  def clear(): Unit = { byPathCol.clear(); lastChecked.clear(); ixCache.clear() }
}
