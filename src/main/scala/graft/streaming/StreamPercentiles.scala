package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING PERCENTILE MONITORING via additive VALUE HISTOGRAMS: each
  * micro-batch lands its per-(key, value) counts as its own
  * replay-idempotent delta dir ([[StreamSketch]]'s exactly-once
  * convention), and the merged histogram yields EXACT interpolated
  * percentiles — counts add, so the streamed result equals the one-shot
  * batch computation bit-for-bit, which is what lets the oracle be plain
  * quantile_cont over the raw corpus.
  *
  * The bounded-value-domain assumption is explicit: the store is
  * |keys|·|distinct values| rows (2-dp metric values here). For an
  * unbounded domain the same lifecycle holds with a mergeable quantile
  * sketch (t-digest/KLL) as the delta payload — approximate instead of
  * exact, same store algebra.
  */
object StreamPercentiles {

  /** Ingest `stream`, appending one (key, value, cnt) histogram delta per
    * micro-batch. */
  def start(stream: DataFrame, keyCol: String, valCol: String,
            store: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        batch.groupBy(col(keyCol).as("key"), col(valCol).as("value"))
          .agg(count(lit(1)).as("cnt"))
          .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=$bid")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()

  /** Per-key exact interpolated percentiles from the merged histogram:
    * the standard lower + frac·(upper − lower) at position (n−1)·p —
    * the definition Spark `percentile` and DuckDB `quantile_cont` share.
    * The only window is a per-key cumsum over the value HISTOGRAM;
    * selection of the boundary values is conditional aggregation, so
    * the whole read is histogram-scale. Outputs are rationals of the
    * 2-dp inputs → floor-form rounding. */
  def read(spark: SparkSession, store: String,
           ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "percentiles must lie in [0, 1]")
    val h = spark.read.parquet(store)
      .groupBy("key", "value").agg(sum(col("cnt")).as("c"))
    val cum = h.withColumn("cb",
      coalesce(sum(col("c")).over(Window.partitionBy("key")
        .orderBy("value").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = h.groupBy("key").agg(sum(col("c")).as("n"))
    val withN = cum.join(totals, "key")
    // boundary flags are PER-ROW (n arrives on every row via the totals
    // join), so the final step is plain conditional aggregation
    val flagged = ps.zipWithIndex.foldLeft(withN) { case (df, (p, i)) =>
      val pos = (col("n") - 1).cast("double") * p
      val lo = floor(pos)
      val hi = least(lo + 1, (col("n") - 1).cast("double"))
      df.withColumn(s"pos_$i", pos)
        .withColumn(s"vlo_$i",
          when(col("cb") <= lo && lo < col("cb") + col("c"), col("value")))
        .withColumn(s"vhi_$i",
          when(col("cb") <= hi && hi < col("cb") + col("c"), col("value")))
    }
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      val pos = max(col(s"pos_$i"))
      val frac = pos - floor(pos)
      graft.core.Num.roundHalfUp(max(col(s"vlo_$i")) +
        frac * (max(col(s"vhi_$i")) - max(col(s"vlo_$i"))), 4)
        .as(s"p${math.round(p * 100)}")
    }
    flagged.groupBy("key")
      .agg(max(col("n")).as("n"), aggs: _*)
      .orderBy("key")
  }
}
