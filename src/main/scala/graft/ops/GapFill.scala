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
}
