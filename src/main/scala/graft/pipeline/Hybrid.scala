package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of two ranked result
  * lists, the standard composition of lexical (BM25) and vector (ANN)
  * search for LLM data work (Cormack/Clarke/Büttcher, SIGIR 2009:
  * score(d) = Σ_lists 1/(k + rank_list(d))).
  *
  * Scale shape: the inputs are already-served TOP-K frames (k rows each),
  * so the fusion itself is a join of two tiny sets — all the corpus-scale
  * work lives in the underlying serving plans (partition-pruned postings
  * for BM25, cell/bucket-pruned codes for ANN), which this operator
  * composes without touching. */
object Hybrid {

  /** Fuse two ranked lists by RRF. Each input must have exactly two
    * columns `(id, score)` and rank by score DESC then id ASC (the
    * ordering convention every graft serving path emits — rounded score,
    * ties to the lower id — making ranks, and therefore the fusion,
    * reproducible across engines). Ids present in only one list get that
    * list's contribution alone (the full-outer semantics of RRF). */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kRrf: Int = 60): DataFrame = {
    def ranked(df: DataFrame, rankCol: String): DataFrame = {
      val Seq(id, score) = df.columns.toSeq
      // single-partition window: the input is a served top-k (≤ k rows)
      df.select(col(id).cast("long").as("id"), col(score).as("s"))
        .withColumn(rankCol,
          row_number().over(Window.orderBy(col("s").desc, col("id"))))
        .select(col("id"), col(rankCol))
    }
    ranked(a, "ra").join(ranked(b, "rb"), Seq("id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rb")), lit(0.0)), 6))
      .select(col("id"), col("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }
}
