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
}
