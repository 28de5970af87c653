package graft.fts

import java.util.concurrent.ConcurrentHashMap

/** Registry of persisted full-text indexes, keyed by the canonical path of
  * the indexed table. [[graft.ext.RewriteFtsMatch]] consults it during
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
    * the index carries that column's tokens and no other's. */
  final case class Entry(indexDir: String, idCol: String, textCol: String, buckets: Int)

  private val byPath = new ConcurrentHashMap[String, Entry]()

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
               buckets: Int = 64): Unit =
    byPath.put(canon(tablePath), Entry(indexDir, idCol, textCol, buckets))

  def get(tablePath: String): Option[Entry] =
    Option(byPath.get(canon(tablePath)))

  def clear(): Unit = byPath.clear()
}
