package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in join strategies don't provide
  * directly, composed so they stay shuffle-bounded at 100 TB.
  *
  * Both are declarative compositions (no custom physical operator needed):
  * the as-of join is a union + window — ONE shuffle on the key, never a
  * range-predicate join — and the range join is an equi-join on coarse
  * buckets plus a residual predicate, so it plans as a hash/SMJ join
  * instead of the BroadcastNestedLoop a raw inequality join would pick.
  * Pattern references: reference window exec
  * (sql/core/.../execution/window/WindowExec.scala:37) for the running-
  * last-value shape, and the reference's join-selection fallback order
  * (sql/core/.../execution/SparkStrategies.scala:124) for why a bare
  * inequality predicate must be avoided (it plans as BNLJ).
  */
object Joins {

  /** AS-OF JOIN (point-in-time lookup): for every left row, attach the
    * single latest right row with the same key and `rightTime <=
    * leftTime`. The classic feature-store/training-pipeline join ("what
    * was the user's state when the example was created").
    *
    * Shape: tag both sides, UNION them, and run ONE `last_value(...)
    * IGNORE NULLS` window over a STRUCT of all attached columns, ordered
    * by (time, side-tag) within each key — right rows sort before left
    * rows at equal times, so an exactly-simultaneous right row IS visible
    * to the left row (the standard `<=` as-of contract). Then keep only
    * left rows. The struct is the load-bearing detail: per-column
    * `last(..., ignoreNulls)` would skip a GENUINE null in one attach
    * column and backfill it from an older right row — mixing fields of
    * different rows; the struct is null only for left placeholder rows, so
    * all fields always come from the single latest right row, nulls
    * included. Cost: ONE shuffle by key + a per-partition sort — no range
    * predicate ever reaches a join operator, so there is nothing the
    * planner can turn into a nested loop, and skew tooling (AQE) sees a
    * plain window agg.
    *
    * Right-side dedup: among right rows sharing (key, time) the one with
    * the greatest `rightTiebreak` wins, making the result deterministic
    * (needed for oracle hash-compare; real pipelines want it too).
    *
    * @param attach right-side columns to carry onto each left row
    */
  def asOf(left: DataFrame, leftKey: String, leftTime: String,
           right: DataFrame, rightKey: String, rightTime: String,
           rightTiebreak: String, attach: Seq[String]): DataFrame = {
    require(attach.nonEmpty, "asOf needs at least one column to attach")
    val reserved = Seq("_k", "_t", "_side", "_rn", "_r", "_asof")
    val lClash = left.columns.intersect(reserved ++ attach.map(c => s"asof_$c"))
    require(lClash.isEmpty,
      s"asOf reserves ${(reserved ++ attach.map(c => s"asof_$c")).mkString(", ")}; left side carries ${lClash.mkString(", ")}")
    val rClash = right.columns.intersect(reserved)
    require(rClash.isEmpty,
      s"asOf reserves column names ${reserved.mkString(", ")}; right side carries ${rClash.mkString(", ")}")
    // canonical narrow right side: one row per (key, time); the attach
    // columns travel as ONE struct so the window can never mix fields of
    // different right rows
    val r = right
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(rightKey), col(rightTime))
          .orderBy(col(rightTiebreak).desc)))
      .filter(col("_rn") === 1)
      .select(col(rightKey).as("_k"), col(rightTime).cast("long").as("_t"),
        lit(0).as("_side"), struct(attach.map(col): _*).as("_r"))

    val leftCols = left.columns.toSeq
    val l = left.select(
      Seq(col(leftKey).as("_k"), col(leftTime).cast("long").as("_t"),
        lit(1).as("_side")) ++ leftCols.map(col): _*)

    // align schemas for the union: left lacks the payload struct, right
    // lacks the left columns
    val lAligned = l.withColumn("_r", lit(null).cast(r.schema("_r").dataType))
    val rAligned = leftCols.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    // right rows (_side=0) order before left rows at the same timestamp
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        attach.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }

  /** [[asOf]] with a STALENESS TOLERANCE (pandas merge_asof's
    * `tolerance`; the feature-store freshness contract): the attached
    * right row must satisfy `leftTime − rightTime ≤ tolerance` or the
    * attachment is nulled — a feature older than the window is worse
    * than no feature (training-serving skew). Same single-shuffle
    * union+window plan: the match's own time travels in the attach
    * struct and the staleness check is a post-window projection, so
    * tolerance costs nothing over the plain as-of. Times compare as
    * longs in the caller's unit. */
  def asOfWithin(left: DataFrame, leftKey: String, leftTime: String,
                 right: DataFrame, rightKey: String, rightTime: String,
                 rightTiebreak: String, attach: Seq[String],
                 tolerance: Long): DataFrame = {
    require(tolerance >= 0L, "tolerance must be non-negative")
    val carry = if (attach.contains(rightTime)) attach
                else attach :+ rightTime
    val j = asOf(left, leftKey, leftTime, right, rightKey, rightTime,
      rightTiebreak, carry)
    val stale = col(s"asof_$rightTime").isNull ||
      (col(leftTime).cast("long") -
        col(s"asof_$rightTime").cast("long")) > tolerance
    val nulled = attach.foldLeft(j)((d, c) =>
      d.withColumn(s"asof_$c",
        when(stale, lit(null)).otherwise(col(s"asof_$c"))))
    if (attach.contains(rightTime)) nulled else nulled.drop(s"asof_$rightTime")
  }

  /** RANGE JOIN (interval containment): all (left, right) pairs with
    * `right.t` in `[left.lo, left.hi)`, WITHOUT a nested-loop plan: each
    * left interval explodes into the coarse buckets it overlaps
    * (`sequence(floor(lo/w), floor((hi-1)/w))` — intervals are expected to
    * span O(1) buckets at a well-chosen `bucketWidth`), each right point
    * maps to exactly one bucket, and the join is an EQUI-join on bucket
    * with the interval predicate left as a residual filter. The planner
    * sees a plain equi-join (hash/SMJ, AQE-skew-splittable); the fan-out
    * is bounded by intervals' bucket span, not |left|×|right|.
    *
    * Times are compared as longs (caller casts/encodes); `bucketWidth` in
    * the same unit. */
  def rangeJoin(left: DataFrame, loCol: String, hiCol: String,
                right: DataFrame, tCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left
      .withColumn("_bucket", explode(sequence(
        floor(col(loCol).cast("long") / bucketWidth),
        floor((col(hiCol).cast("long") - 1) / bucketWidth))))
      .filter(col(loCol).cast("long") < col(hiCol).cast("long"))
    val rb = right.withColumn("_bucket",
      floor(col(tCol).cast("long") / bucketWidth))
    lb.join(rb, Seq("_bucket"))
      .filter(col(tCol).cast("long") >= col(loCol).cast("long") &&
        col(tCol).cast("long") < col(hiCol).cast("long"))
      .drop("_bucket")
  }
}
