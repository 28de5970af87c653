package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity (fuzzy) string join — EXACT at edit distance ≤ 1 — via
  * deletion neighborhoods (the FastSS scheme): each string's blocking keys
  * are itself plus every single-character deletion. Two strings within one
  * edit share a key (equal → self key; one substitution → deleting the
  * substituted position on both sides yields the same string; one
  * insertion/deletion → deleting the extra character on the longer side
  * yields the shorter), so candidate generation is an EQUI-join on the
  * variant — a shuffle join on a short string key, never all-pairs, never
  * a nested loop — and the final `levenshtein ≤ 1` verify runs on
  * candidates only (precision 1.0, recall 1.0 by the argument above).
  *
  * Scale: key rows = Σ(len+1) ≈ avg_len·n; a hot key (many equal strings)
  * produces exactly the pairs the RESULT must contain anyway, so the
  * candidate count is output-bound, not corpus-bound. The reference has
  * in-engine `levenshtein` (stringExpressions.scala:1100) but no
  * similarity-join operator — this is the join-shaped completion of it.
  */
object Fuzzy {

  /** All (aid < bid) pairs whose `strCol` values are within edit distance
    * 1, with the distance. Column names in the result: aid, bid, a_s, b_s,
    * dist. */
  def fuzzyJoin1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // deletion i (1-based): prefix of length i−1 ++ suffix from i+1.
    // sequence(1, 0) would count DOWN for the empty string — guard it.
    val deletions = transform(sequence(lit(1), length(col("s"))),
      i => concat(substr(col("s"), lit(1), i - 1),
        substr(col("s"), i + 1, length(col("s")))))
    val variants = base.withColumn("v",
      explode(when(length(col("s")) === 0, array(col("s")))
        .otherwise(array_union(array(col("s")), array_distinct(deletions)))))
    variants.as("a").join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("aid"), col("b.id").as("bid"),
        col("a.s").as("a_s"), col("b.s").as("b_s"))
      .distinct()
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
      .filter(col("dist") <= 1)
  }
}
