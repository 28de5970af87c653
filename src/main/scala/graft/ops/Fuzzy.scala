package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale: the neighborhood join runs over DISTINCT strings, with id groups
  * expanded afterward. Equal strings share ALL len+1 variants, so running
  * the join on raw rows regenerates every duplicate pair ~len times before
  * dedup (a 64-distinct-name/20k-row corpus produced ~10⁸ candidate rows —
  * 75 s; restructured: the variant join touches 64 rows and the output
  * expansion is exactly result-bound). Key rows = Σ(len+1) over distinct
  * strings; equal-string (dist-0) pairs never enter the join at all — they
  * expand directly from each string's id group. The reference has in-engine
  * `levenshtein` (stringExpressions.scala:1100) but no similarity-join
  * operator — this is the join-shaped completion of it.
  */
object Fuzzy {

  /** All (aid < bid) pairs whose `strCol` values are within edit distance
    * 1, with the distance. Column names in the result: aid, bid, a_s, b_s,
    * dist. */
  def fuzzyJoin1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    fuzzyJoinK(df, idCol, strCol, 1)

  /** Every single-character deletion of `c` (1-based position i removed),
    * deduped; empty array for the empty string (`sequence(1, 0)` would
    * count DOWN, not produce an empty range). */
  private def deletionsOf(c: Column): Column = {
    val dels = transform(sequence(lit(1), length(c)),
      i => concat(substr(c, lit(1), i - 1), substr(c, i + 1, length(c))))
    when(length(c) === 0, array().cast("array<string>"))
      .otherwise(array_distinct(dels))
  }

  /** All (aid < bid) pairs within edit distance `k` (1 or 2), with the
    * distance — FastSS generalized: the blocking keys are the deletion
    * neighborhood of depth k (the string, every ≤1-deletion variant, and
    * for k=2 every ≤2-deletion variant). Two strings within k edits share
    * a depth-k variant (delete the edited positions on both sides), so the
    * equi-join on the variant has recall 1.0; precision comes from the
    * levenshtein ≤ k verify on candidates only. LENGTH BANDING —
    * ||a|−|b|| ≤ k is necessary for ed ≤ k — sits in the join condition,
    * so impossible pairs never enter the candidate shuffle. Neighborhood
    * size is ~len^k/k! per distinct string (k=2, len 30 → ~450 keys): the
    * entity-resolution sweet spot, still never all-pairs. */
  def fuzzyJoinK(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k == 1 || k == 2, s"supported neighborhood depths: 1 or 2, got $k")
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // one row per DISTINCT string, carrying its id group (at warehouse
    // scale this is "write the string dictionary": distinct strings ≪ rows)
    val strs = base.groupBy(col("s"))
      .agg(collect_list(col("id")).as("ids"))
      .persist()
    strs.count() // scanned by the variant join (twice) and both expansions

    // dist-0 pairs: all id pairs within one string's group — result-bound,
    // no join (k ids → k(k−1)/2 pairs the output must contain anyway)
    val eqPairs = strs.filter(size(col("ids")) > 1)
      .select(col("s"), col("ids"))
      .withColumn("ida", explode(col("ids")))
      .withColumn("idb", explode(col("ids")))
      .filter(col("ida") < col("idb"))
      .select(col("ida").as("aid"), col("idb").as("bid"),
        col("s").as("a_s"), col("s").as("b_s"))

    // deletion neighborhood of depth k over distinct strings
    val d1 = deletionsOf(col("s"))
    val varSet =
      if (k == 1) array_union(array(col("s")), d1)
      else array_union(
        array_union(array(col("s")), d1),
        array_distinct(flatten(transform(d1, v => deletionsOf(v)))))
    val variants = strs.select(col("s"), explode(varSet).as("v"))
    val strPairs = variants.as("a").join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.s") < col("b.s") &&
          // length band: ||a|−|b|| ≤ k is necessary for ed ≤ k
          abs(length(col("a.s")) - length(col("b.s"))) <= k)
      .select(col("a.s").as("a_s"), col("b.s").as("b_s"))
      .distinct()
      .filter(levenshtein(col("a_s"), col("b_s")).between(1, k))
    // expand each verified string pair to its id-group cross product
    // (result-bound by definition), restoring aid < bid — the string
    // columns swap with their ids
    val nearPairs = strPairs
      .join(strs.select(col("s").as("a_s"), col("ids").as("a_ids")), "a_s")
      .join(strs.select(col("s").as("b_s"), col("ids").as("b_ids")), "b_s")
      .withColumn("ida", explode(col("a_ids")))
      .withColumn("idb", explode(col("b_ids")))
      .select(
        least(col("ida"), col("idb")).as("aid"),
        greatest(col("ida"), col("idb")).as("bid"),
        when(col("ida") < col("idb"), col("a_s")).otherwise(col("b_s")).as("a_s"),
        when(col("ida") < col("idb"), col("b_s")).otherwise(col("a_s")).as("b_s"))

    eqPairs.unionAll(nearPairs)
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
  }
}
