package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verification query: a Spark-side implementation plus (where SQL can
  * express it) an equivalent DuckDB oracle statement over the same parquet
  * tables. `oracle = None` → the driver records a weaker rows-only check.
  *
  * Determinism contract (SURVEY.md §2.12 hazards):
  *  - money arithmetic is done in exact DECIMAL on both sides and cast to
  *    DOUBLE only at output (no float rounding ambiguity);
  *  - transcendental outputs (ln/pow/cosine/BM25) are rounded;
  *  - timestamps are rendered as strings; every query has a total ORDER BY.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryPack {
  def queries: Seq[Q]
}
