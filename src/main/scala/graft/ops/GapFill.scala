package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series regularization: downsample to a fixed grid and
  * forward-fill the gaps (resample + LOCF — the pandas
  * `resample().ffill()` / InfluxDB `FILL(previous)` shape) — the step
  * that turns an irregular event stream into the regular series
  * windowed features and monitoring queries assume.
  */
object GapFill {

  /** Aggregate `valueExpr` per (`keyCol`, `unit`-truncated bucket),
    * materialize each key's FULL bucket grid from its first to its last
    * observation, and forward-fill buckets with no observations from the
    * last seen value (`filled` marks carried rows). `unit` is a
    * `date_trunc`/INTERVAL unit ("hour", "day", …).
    *
    * Scale shape: the observation aggregate and the window are both
    * keyed on `keyCol` — embarrassingly parallel across keys, no global
    * sort; the grid explode emits span/step rows per key (bounded by
    * retention × resolution, independent of event volume); the grid and
    * the observations meet in one equi-join on (key, bucket). */
  def fillForward(df: DataFrame, keyCol: String, tsCol: String,
                  valueExpr: Column, unit: String): DataFrame = {
    require(Set("hour", "day", "minute", "week", "month")(unit.toLowerCase),
      s"unsupported grid unit: $unit")
    val obs = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(valueExpr.as("v"))
    val spans = obs.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL 1 $unit"))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("v"), ignoreNulls = true).over(w).as("value"),
        col("v").isNull.as("filled"))
  }

  /** LINEAR INTERPOLATION on the same grid (pandas `interpolate()` /
    * InfluxDB `FILL(linear)`): a gap bucket takes the straight line
    * between its last observation before and first after —
    * prev + (next − prev) · elapsed/span. Interior gaps only; leading and
    * trailing buckets outside the observed span don't exist (the grid
    * runs first-to-last observation), so every gap has both anchors.
    *
    * Same scale shape as [[fillForward]] plus one backward window: both
    * windows key on `keyCol`, per-task state is one key's span. The
    * fraction arithmetic runs on epoch-second longs (exact); only the
    * final value mixes doubles, rounded for cross-engine replay. */
  def fillLinear(df: DataFrame, keyCol: String, tsCol: String,
                 valueExpr: Column, unit: String,
                 scale: Int = 4): DataFrame = {
    require(Set("hour", "day", "minute", "week", "month")(unit.toLowerCase),
      s"unsupported grid unit: $unit")
    val obs = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(valueExpr.as("v"))
    val spans = obs.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL 1 $unit"))).as("bucket"))
    val W = org.apache.spark.sql.expressions.Window
    val fwd = W.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(W.unboundedPreceding, 0)
    val bwd = W.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(0, W.unboundedFollowing)
    val withAnchors = grid.join(obs, Seq(keyCol, "bucket"), "left")
      .withColumn("ts_s", unix_timestamp(col("bucket")))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("pt", last(when(col("v").isNotNull, col("ts_s")),
        ignoreNulls = true).over(fwd))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(bwd))
      .withColumn("nt", first(when(col("v").isNotNull, col("ts_s")),
        ignoreNulls = true).over(bwd))
    // interpolated values are RATIONAL and routinely land exactly on the
    // rounding boundary (a half-hour gap puts the true value at …x5), so
    // round() — a different algorithm per engine — flips the last digit;
    // floor(x·10^s + 0.5)/10^s is the same IEEE ops on the same doubles
    // in both engines, boundary or not
    val grain = math.pow(10.0, scale)
    withAnchors.select(col(keyCol), col("bucket"),
      (floor((when(col("v").isNotNull, col("v"))
        .otherwise(col("pv") + (col("nv") - col("pv")) *
          ((col("ts_s") - col("pt")).cast("double") /
            (col("nt") - col("pt")).cast("double")))) * grain + 0.5) / grain)
        .as("value"),
      col("v").isNull.as("filled"))
  }
}
