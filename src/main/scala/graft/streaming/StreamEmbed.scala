package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INCREMENTAL EMBEDDING MAINTENANCE — the streaming lifecycle for the
  * PPMI trainer (reference seed ml/feature/Word2Vec.scala:121, trained
  * closed-form as [[graft.pipeline.Embed]]): windowed co-occurrence
  * counts are ADDITIVE across document batches (window pairs never cross
  * document boundaries), so each micro-batch contributes an independent
  * `(a, b, cab)` delta and the current space is recoverable from the
  * folded sum at any time. A 100 TB pipeline never re-pays the corpus
  * pass on new data: ingest appends vocabulary²-bounded sparse deltas,
  * serving folds Σcab (state bounded by distinct observed pairs, NOT by
  * corpus size) and runs the dictionary-sized PPMI → vectors algebra.
  *
  * Delta contract (shared by every graft streaming sink): each batch
  * writes its own `batch_id=` partition with dynamic partition overwrite,
  * so a crash-replayed batch idempotently replaces only itself.
  * Compaction is the usual fold: rewrite the log as one summed table and
  * truncate — the serve-side algebra cannot tell the difference.
  */
object StreamEmbed {

  /** Start the co-occurrence delta sink for one ingest run; rerunning
    * with the same checkpoint resumes at the unprocessed files. */
  def start(docsStream: DataFrame, outDir: String,
            window: Int = 2): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.Embed.cooccurrence(batch, window)
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$outDir/data")
      }
      .start()

  /** The current co-occurrence table: Σcab over all ingested deltas. */
  def cooc(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/data")
      .groupBy("a", "b").agg(sum(col("cab")).as("cab"))

  /** Serve the trained space from the ingested state — identical algebra
    * (and bit-identical output) to the batch trainer over the same docs. */
  def serveEmbeddings(spark: SparkSession, outDir: String, dims: Int = 8,
                      powerIters: Int = 3): DataFrame =
    graft.pipeline.Embed.trainFromCooc(cooc(spark, outDir), dims, powerIters)
}
