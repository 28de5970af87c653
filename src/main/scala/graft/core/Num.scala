package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine numeric forms. */
object Num {

  /** Half-up rounding in floor form: floor(x·10^s + 0.5)/10^s.
    *
    * round(x, s) DIVERGES across engines when the true value lands
    * exactly on the half boundary — which RATIONAL outputs (ratios of
    * integers: shares, mean lengths, padding efficiency, interpolation
    * fractions) do routinely, unlike transcendental-derived values (BM25
    * logs) whose doubles essentially never sit on the boundary. The
    * floor form is the same IEEE ops on the same doubles in Spark and
    * DuckDB, boundary or not, so oracle replays stay bit-stable at every
    * data scale. Mirror it verbatim in the oracle SQL:
    * `floor(x * 10000 + 0.5) / 10000`. (Half-up semantics assume x ≥ 0 —
    * all the ratio sites — since floor-form rounds negatives toward
    * +infinity at the boundary.) */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val g = math.pow(10.0, scale)
    floor(c * g + 0.5) / g
  }
}
