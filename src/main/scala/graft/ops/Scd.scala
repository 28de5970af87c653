package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING DIMENSION, type 2 (Kimball dimension versioning): a
  * change batch closes the affected keys' current rows (valid_to = change
  * time) and opens new versions; history rows are immutable. The shape
  * every warehouse runs between an operational feed and its dimensions.
  *
  * Scale posture: the change batch is the small side — one per-key
  * latest-change window over the BATCH, one join against the dimension's
  * current slice (broadcast when the batch is small, hash join otherwise);
  * the history slice passes through untouched, so the rewrite cost is the
  * current slice + the batch, never the accumulated history. */
object Scd {

  /** Apply one change batch. `dim` carries `keyCol`, the tracked
    * `attrCols`, and the bookkeeping columns (`valid_from: String`,
    * `valid_to: String` null = open, `is_current: Boolean`); `changes`
    * carries `keyCol`, `attrCols`, and `tsCol` (a sortable string date).
    * Multiple change rows per key collapse to the latest by (`tsCol`,
    * then attr order for determinism). A change equal to the key's
    * current attributes is the standard SCD no-op; a brand-new key
    * inserts its first version. */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCol: String,
                   attrCols: Seq[String], tsCol: String): DataFrame = {
    require(attrCols.nonEmpty, "no tracked attributes")
    val latest = changes
      .withColumn("rn", row_number().over(Window.partitionBy(keyCol)
        .orderBy(col(tsCol).desc, struct(attrCols.map(col): _*).desc)))
      .filter(col("rn") === 1).drop("rn")
    val current = dim.filter(col("is_current"))
    val history = dim.filter(!col("is_current"))
    val cur = current.select(
      col(keyCol) +: col("valid_from").as("cur_from") +:
        attrCols.map(c => col(c).as(s"cur_$c")): _*)
    val j = latest.join(cur, Seq(keyCol), "left_outer")
    // null-safe change detection: =!= evaluates to NULL when either side
    // is NULL, and filter(NULL) silently drops the row — a change setting
    // a tracked attribute to NULL would never open a version. <=> treats
    // NULL as a comparable value; the brand-new-key arm keys off cur_from
    // (never NULL on an existing current row), not the attributes, so an
    // existing key whose current attribute is legitimately NULL is not
    // misread as new.
    val differs = col("cur_from").isNull || attrCols
      .map(c => !(col(c) <=> col(s"cur_$c")))
      .reduce(_ || _)
    val effective = j.filter(differs)
    // close the changed keys' current rows at the change time
    val closed = current
      .join(effective.select(col(keyCol), col(tsCol).as("close_ts")), keyCol)
      .withColumn("valid_to", col("close_ts"))
      .withColumn("is_current", lit(false))
      .drop("close_ts")
    val untouched = current.join(
      effective.select(keyCol), Seq(keyCol), "left_anti")
    val opened = effective.select(
      col(keyCol) +: attrCols.map(col) :+
        col(tsCol).as("valid_from") :+
        lit(null).cast("string").as("valid_to") :+
        lit(true).as("is_current"): _*)
    history.unionByName(closed).unionByName(untouched)
      .unionByName(opened.select(history.columns.map(col): _*))
  }
}
