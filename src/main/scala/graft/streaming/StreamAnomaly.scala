package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING RATE-ANOMALY DETECTION at ingest — the ops twin of the
  * batch rolling z-score (q_temporal_anomaly): every micro-batch lands
  * its per-key event counts as its OWN delta dir (`store/bid=<id>/`, the
  * [[StreamSketch]] exactly-once convention: a replayed batch overwrites
  * its own dir with bit-identical content and touches nothing else), and
  * the monitor view scores each batch's count against the mean/stddev of
  * its preceding batches per key.
  *
  * Scale: the store grows one ≤|keys|-row delta per batch — key-space
  * sized, never corpus-sized; the read-side window partitions by key and
  * orders by batch id, so the scoring frame is (keys × batches) rows.
  * Long-lived streams bound the file count exactly like the CMS store
  * (fold old bids with [[StreamSketch.compact]]-style folds — counts are
  * additive per (key, bid), and whole-bid rows are immutable).
  */
object StreamAnomaly {

  /** Ingest `stream` and append one (key, n) delta per micro-batch. */
  def start(stream: DataFrame, keyCol: String, store: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        batch.groupBy(col(keyCol).as("key"))
          .agg(count(lit(1)).as("n"))
          .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=$bid")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()

  /** The monitor view: each batch's count z-scored against the `lookback`
    * PRECEDING batches of the same key (rows frame — a key absent from a
    * batch simply has no row, same contract as the batch op). Keys whose
    * history is shorter than `lookback` or flat (sd = 0) are unscored.
    * z/sd are sqrt-derived → plain round; the flag compares the ROUNDED z
    * so external replays flip identically. */
  def read(spark: SparkSession, store: String, lookback: Int = 3,
           threshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("key").orderBy("bid")
      .rowsBetween(-lookback, -1)
    spark.read.parquet(store)
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev_samp(col("n")).over(w))
      .withColumn("n_prev", count(col("n")).over(w))
      .filter(col("n_prev") === lookback && col("sd") > 0)
      .withColumn("z", round((col("n") - col("mu")) / col("sd"), 4))
      .select(col("key"), col("bid").cast("long").as("bid"), col("n"),
        graft.core.Num.roundHalfUp(col("mu"), 4).as("mean_prev"),
        round(col("sd"), 4).as("sd_prev"), col("z"),
        (abs(col("z")) >= threshold).as("is_anomaly"))
      .orderBy("key", "bid")
  }
}
