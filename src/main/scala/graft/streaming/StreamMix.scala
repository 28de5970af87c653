package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming MIXTURE-BUDGET maintenance: per-source token counts are the
  * third additive lifecycle beside the CMS grid and the A-ES reservoir
  * ([[StreamSketch]]) — per-batch (source, Σtokens) sums ADD, so every
  * micro-batch lands only its own delta dir (`store/bid=<batchId>/`,
  * replay-idempotent: a replayed batch rewrites its own dir with
  * bit-identical content) and the corpus counts are the merge-on-read.
  * Temperature budgets ([[graft.pipeline.Mixing.temperatureBudgetsCounted]])
  * then derive from the merged counts exactly as they would from a batch
  * pass — streamed ingest and one-shot computation provably agree. The
  * state is |sources| rows per batch; at 1000 executors the fold is a
  * tree-reduce of source-count maps, never a data shuffle. */
object StreamMix {

  /** Ingest `stream` and maintain per-source token counts at `store`. */
  def start(stream: DataFrame, sourceCol: String, toksCol: String,
            store: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        batch.groupBy(col(sourceCol).cast("string").as("source"))
          .agg(sum(col(toksCol)).cast("bigint").as("n"))
          .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=$bid")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()

  /** The merged per-source counts: addition across all landed deltas. */
  def readCounts(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(store)
      .groupBy("source").agg(sum(col("n")).cast("bigint").as("n"))
}
