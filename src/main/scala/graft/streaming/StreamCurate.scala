package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Curation at INGEST — the filters a training pipeline runs before a
  * document ever lands, starting with benchmark decontamination: each
  * micro-batch is scrubbed against the (broadcast) eval set and only the
  * clean remainder is written. Decontamination is per-document against a
  * FIXED benchmark, so it is exactly batch-decomposable — the streamed
  * union equals one batch [[graft.pipeline.Dedup.decontaminate]] over the
  * whole corpus (the oracle contract), unlike near-dup dedup, which needs
  * the cross-batch signature store [[StreamDedup]] maintains.
  *
  * Scale shape per batch: the benchmark side broadcasts (eval sets are
  * thousands of docs; the batch is the only corpus-sized side and it
  * never shuffles for the candidate join), and the output lands as a
  * `batch_id`-partitioned parquet log with dynamic partition overwrite —
  * a crash-replayed batch idempotently replaces only its own partition,
  * the delta contract every graft streaming sink shares. */
object StreamCurate {

  /** Start the scrub-and-append sink; [[read]] serves the clean corpus. */
  def startDecontaminated(docsStream: DataFrame, benchmark: DataFrame,
                          outDir: String, threshold: Double = 0.8,
                          idCol: String = "doc_id",
                          textCol: String = "text"): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.Dedup
          .decontaminate(batch, benchmark, threshold, idCol, textCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$outDir/data")
      }
      .start()

  /** The decontaminated corpus ingested so far. */
  def read(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/data").drop("batch_id")

  /** PERCOLATION at ingest — the alerting sink (the percolator's natural
    * home: "tell me when a doc matching my saved query ARRIVES"): each
    * micro-batch probes the FIXED subscription table
    * ([[graft.fts.Search.percolate]]) and the (doc_id, query_id) alert
    * pairs land in the partitioned log. Per-document and stateless
    * against fixed subscriptions ⇒ the streamed union equals one batch
    * percolate over the whole corpus (the oracle contract); per batch
    * the work is two batch-sized broadcast joins against the
    * subscription side — no cross-batch state, no corpus shuffle. */
  def startPercolated(docsStream: DataFrame, subscriptions: DataFrame,
                      outDir: String): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.fts.Search.percolate(batch, subscriptions)
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$outDir/data")
      }
      .start()

  /** QUALITY filtering at ingest — the C4 line/page scrub
    * ([[graft.pipeline.Curation.c4Clean]]) then the Gopher document rules
    * ([[graft.pipeline.Curation.gopherQuality]], judged on the CLEANED
    * text) applied per micro-batch; only documents passing both land,
    * carrying the C4-cleaned text. Both recipes are per-document and
    * stateless, so the streamed union equals one batch application over
    * the whole corpus (the oracle contract). Per batch everything is a
    * narrow projection plus one batch-sized semi-join — no corpus
    * shuffle, no cross-batch state; the partitioned log write is the
    * delta contract every graft streaming sink shares. */
  def startQualityFiltered(docsStream: DataFrame, outDir: String,
                           idCol: String = "doc_id",
                           textCol: String = "text"): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val c4 = graft.pipeline.Curation.c4Clean(batch, idCol, textCol)
          .filter(col("keep"))
          .select(col(idCol), col("clean_text").as(textCol))
        c4.join(
            graft.pipeline.Curation.gopherQuality(c4, idCol, textCol)
              .filter(col("keep")).select(col(idCol)),
            Seq(idCol), "left_semi")
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$outDir/data")
      }
      .start()
}
