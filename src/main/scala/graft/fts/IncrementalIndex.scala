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
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Append).parquet(s"$dir/doclens_delta")
      }
      .start()

  private def maxBatchId(spark: SparkSession, dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/postings_delta")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) None
    else {
      val r = spark.read.parquet(s"$dir/postings_delta")
        .agg(max(col("batch_id"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
  }

  /** Append document TOMBSTONES as of the latest ingested batch: the
    * deleted docs' CURRENT versions disappear from every subsequent
    * merge-on-read view ([[read]] anti-joins `batch_id ≤ as_of`) and from
    * the next compaction — the merge-on-read DELETE pattern: base postings
    * stay immutable, removal is data, not mutation. Versioning the
    * tombstone ("delete what exists now") is what lets a later [[upsert]]
    * re-add the same doc id. Idempotent; a delete before any ingest is a
    * no-op. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String = "doc_id"): Unit =
    maxBatchId(spark, dir).foreach { asOf =>
      ids.select(col(idCol).as("doc_id")).distinct()
        .withColumn("as_of", lit(asOf))
        .write.mode(SaveMode.Append).parquet(s"$dir/deletes_delta")
    }

  /** UPSERT: tombstone the docs' current versions and append the
    * replacements as a new delta batch (positional if the log is) — an
    * update costs one tombstone + one doc-sized append, never an index
    * rewrite. Single-writer like the streaming sink (the next batch id is
    * read from the log; concurrent writers need external coordination), and
    * upserts must not interleave with an ACTIVE streaming ingest — the
    * stream's checkpointed batch counter does not know about upsert
    * batches, so quiesce the stream first (AvailableNow ingests make that
    * natural). */
  def upsert(spark: SparkSession, dir: String, docs: DataFrame,
             idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val nextBatch = maxBatchId(spark, dir).map(_ + 1).getOrElse(0L)
    delete(spark, dir, docs.select(col(idCol)), idCol)
    val positional = maxBatchId(spark, dir).isDefined &&
      spark.read.parquet(s"$dir/postings_delta").columns.contains("positions")
    val ix = if (positional) Index.buildPositional(docs, idCol, textCol)
             else Index.build(docs, idCol, textCol)
    ix.postings.withColumn("batch_id", lit(nextBatch))
      .write.mode(SaveMode.Append).parquet(s"$dir/postings_delta")
    ix.docLens.withColumn("batch_id", lit(nextBatch))
      .write.mode(SaveMode.Append).parquet(s"$dir/doclens_delta")
  }

  /** Merge-on-read view over the accumulated deltas. TOMBSTONES
    * ([[delete]]/[[upsert]]) are applied to the RAW rows first — a
    * tombstone kills rows with `batch_id ≤ as_of`, so an upserted doc's
    * old version dies while its replacement (a later batch) survives —
    * then rows aggregate per (term, doc_id): safe because a doc LIVES in
    * exactly one surviving batch (append-only ingest + upsert's
    * tombstone-then-append). A positions column (positional ingest) is
    * detected from the schema and carried through; corpus stats re-derive
    * from the surviving doc lengths. */
  def read(spark: SparkSession, dir: String): FtsIndex = {
    var rawP = spark.read.parquet(s"$dir/postings_delta")
    var rawL = spark.read.parquet(s"$dir/doclens_delta")
    val delPath = new org.apache.hadoop.fs.Path(s"$dir/deletes_delta")
    if (delPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(delPath)) {
      val dels = spark.read.parquet(s"$dir/deletes_delta")
        .select(col("doc_id").as("del_id"), col("as_of"))
      rawP = rawP.join(dels,
        rawP("doc_id") === dels("del_id") && rawP("batch_id") <= dels("as_of"),
        "left_anti")
      rawL = rawL.join(dels,
        rawL("doc_id") === dels("del_id") && rawL("batch_id") <= dels("as_of"),
        "left_anti")
    }
    val postings =
      if (rawP.columns.contains("positions"))
        rawP.groupBy("term", "doc_id").agg(sum(col("tf")).as("tf"),
          sort_array(flatten(collect_list(col("positions")))).as("positions"))
      else rawP.groupBy("term", "doc_id").agg(sum(col("tf")).as("tf"))
    val docLens = rawL.groupBy("doc_id").agg(sum(col("dl")).as("dl"))
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
