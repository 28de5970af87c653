package graft.fts

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental inverted-index maintenance for streaming document ingest
  * (SURVEY.md §7 step 6). Strategy: merge-on-read deltas — each micro-batch
  * appends its own postings partition (cheap, append-only, no read-modify-
  * write of the base index), readers aggregate deltas on the fly, and a
  * compaction job periodically folds deltas into the canonical bucketed
  * layout. The reference snapshot had no watermark/late-data story
  * (pre-watermark StreamExecution.scala:174); bounding state by delta files
  * + compaction sidesteps unbounded streaming aggregation state entirely.
  */
object IncrementalIndex {

  /** Start a foreachBatch sink that appends per-batch postings deltas.
    * `positional = true` captures per-doc position lists in the deltas
    * ([[Index.buildPositional]]) — downstream readers/compaction detect the
    * positions column automatically, and a compacted positional index
    * serves SQL `fts_near`/`fts_phrase` from position lists alone. */
  def start(docsStream: DataFrame, dir: String,
            idCol: String = "doc_id", textCol: String = "text",
            positional: Boolean = false): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      // durable offsets: a restarted ingest must NOT replay batches into the
      // append-only delta log (exactly-once = offset WAL + idempotent append)
      .option("checkpointLocation", s"$dir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ONE build per batch: docLens derives from the same postings frame,
        // so a second Index.build would re-run scan→tokenize→explode→groupBy
        // for a frame the first call already produced (2× tokenize on the
        // ingest path)
        val ix = if (positional) Index.buildPositional(batch, idCol, textCol)
                 else Index.build(batch, idCol, textCol)
        ix.postings
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Append).parquet(s"$dir/postings_delta")
        ix.docLens
          .write.mode(SaveMode.Append).parquet(s"$dir/doclens_delta")
      }
      .start()

  /** Append document TOMBSTONES: the deleted docs disappear from every
    * subsequent merge-on-read view ([[read]] anti-joins them) and from the
    * next compaction (which reads through [[read]]) — the merge-on-read
    * DELETE pattern: base postings stay immutable, removal is data, not
    * mutation. Idempotent (re-deleting an id is harmless). */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String = "doc_id"): Unit =
    ids.select(col(idCol).as("doc_id")).distinct()
      .write.mode(SaveMode.Append).parquet(s"$dir/deletes_delta")

  /** Merge-on-read view over the accumulated deltas. Re-aggregation is safe
    * because a doc appears in exactly one batch (append-only ingest); a
    * positions column in the deltas (positional ingest) is detected from
    * the schema and carried through (one batch per doc → flatten of a
    * 1-element list group is the doc's own sorted list). */
  def read(spark: SparkSession, dir: String): FtsIndex = {
    val raw = spark.read.parquet(s"$dir/postings_delta")
    var postings =
      if (raw.columns.contains("positions"))
        raw.groupBy("term", "doc_id").agg(sum(col("tf")).as("tf"),
          sort_array(flatten(collect_list(col("positions")))).as("positions"))
      else raw.groupBy("term", "doc_id").agg(sum(col("tf")).as("tf"))
    var docLens = spark.read.parquet(s"$dir/doclens_delta")
      .groupBy("doc_id").agg(sum(col("dl")).as("dl"))
    // tombstones ([[delete]]): anti-join both sides; stats re-derive from
    // the surviving doc lengths, so n_docs/avgdl shrink with the corpus
    val delPath = new org.apache.hadoop.fs.Path(s"$dir/deletes_delta")
    if (delPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(delPath)) {
      val dels = spark.read.parquet(s"$dir/deletes_delta")
      // using-column joins move doc_id to the front — restore the layout
      val pCols = postings.columns
      postings = postings.join(dels, Seq("doc_id"), "left_anti")
        .select(pCols.map(col): _*)
      docLens = docLens.join(dels, Seq("doc_id"), "left_anti")
        .select("doc_id", "dl")
    }
    val stats = docLens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    FtsIndex(postings, docLens, stats)
  }

  /** Fold deltas into the canonical bucketed layout (Index.write format). */
  def compact(spark: SparkSession, dir: String, outDir: String,
              buckets: Int = 64): Unit =
    Index.write(read(spark, dir), outDir, buckets)

  /** [[compact]] plus the other half of the lifecycle [[Index.createIndex]]
    * performs: register the compacted index for `tablePath` (the table the
    * stream ingested) and persist the association metadata — so SQL
    * `fts_match`/`fts_score`/… over that table serves through the compacted
    * bucketed postings without a manual registration step. A POSITIONAL
    * ingest ([[start]] with positional=true) is detected from the delta
    * schema and registered as such, so `fts_near`/`fts_phrase` lower to
    * pure position-list plans over the compacted index. */
  def compactAndRegister(spark: SparkSession, dir: String, outDir: String,
                         tablePath: String, idCol: String = "doc_id",
                         textCol: String = "text", buckets: Int = 64): Unit = {
    compact(spark, dir, outDir, buckets)
    val positional = spark.read.parquet(s"$dir/postings_delta")
      .columns.contains("positions")
    IndexCatalog.register(tablePath, outDir, idCol, textCol, buckets, positional)
    IndexCatalog.writeMeta(spark, tablePath, outDir, idCol, textCol, buckets,
      positional)
  }
}
