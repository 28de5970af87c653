package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV / theta-sketch set cardinality — k-minimum-values (Beyer et al.,
  * "On synopses for distinct-value estimation under multiset operations",
  * SIGMOD 2007) and the theta-sketch set algebra over them (Dasgupta et
  * al., "Theta-sketch framework", 2016). The one estimate HLL cannot give:
  * INTERSECTION cardinality between corpora — "how much does crawl B
  * overlap crawl A" — without ever joining the corpora. Planning input
  * for dedup/decontamination passes at 100 TB: two bounded sketches meet
  * instead of two corpora.
  *
  * Sketch = the k smallest distinct values of a uniform 60-bit key hash.
  * The hash is the first 15 hex digits of md5 (2⁶⁰ space) — both engines
  * compute it identically (Spark `conv(substr(md5(x),1,15),16,10)`,
  * DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`), so every estimate is
  * EXACTLY replayable in the oracle, unlike an opaque HLL register blob.
  *
  * Estimators (u = h / 2⁶⁰ normalized):
  *  - distinct:      D̂ = (k−1) / u_k              (u_k = kth smallest)
  *  - union:         θ = kth smallest of A ∪ B;  Û = (k−1) / u_θ
  *  - intersection:  M = |{v < θ : v ∈ sketch(A) ∧ v ∈ sketch(B)}|;
  *                   Î = M / u_θ
  *    (every hash below θ is fully known to BOTH sketches since
  *    θ ≤ min(θ_A, θ_B) — the theta-sketch soundness argument)
  *
  * Scale shape: `sketch` is distinct (map-side partial agg) +
  * TakeOrderedAndProject (per-partition k-heap, merge at the driver) —
  * bounded state at any corpus size; the estimator arithmetic runs over
  * k-row frames. Standard error ~1/√k (k=256 → ~6%).
  *
  * EXACT MODE: a sketch that never filled (fewer than k distinct keys)
  * IS the full distinct hash set, so counts are returned exactly — the
  * same small-set contract real theta sketches keep. */
object Kmv {

  /** 2⁶⁰ as an exact double: the hash-space size for normalization. */
  val HashSpace: Double = math.pow(2.0, 60.0)

  /** Uniform 60-bit key hash, identical in both engines (see scaladoc). */
  def keyHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** The KMV sketch of `keyCol`: k smallest distinct key hashes, as a
    * 1-column frame `h` (≤ k rows, sorted ascending by construction of
    * the consumers — do not rely on row order). */
  def sketch(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 16, s"k < 16 has no estimation power, got $k")
    df.select(keyHash(col(keyCol)).as("h")).distinct()
      .orderBy("h").limit(k)
  }

  /** Distinct-count estimate from one sketch: (k−1)/u_k, or the exact
    * count when the sketch never filled. One row: `est BIGINT, exact
    * BOOLEAN`. */
  def distinctEstimate(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(
        when(col("n") < k, col("n"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(HashSpace) /
            col("hk").cast("double")))
          .cast("long").as("est"),
        (col("n") < k).as("exact"))

  /** Union + intersection estimates from two sketches built with the SAME
    * k. One row: `est_union, est_inter (BIGINT), exact (BOOLEAN)`. Both
    * sketches under-filled → exact distinct counts of the hash sets
    * (which are the true sets in that regime). */
  def setEstimates(ska: DataFrame, skb: DataFrame, k: Int): DataFrame = {
    val merged = ska.unionByName(skb).distinct().orderBy("h").limit(k)
    val stats = merged.agg(count(lit(1)).as("n"), max(col("h")).as("th"))
    val inter = ska.join(skb, "h")
    // estimation mode: members strictly below θ are fully known to both
    val m = inter.join(broadcast(stats), col("h") < col("th"), "left_semi")
      .agg(count(lit(1)).as("m"))
    // exact mode: the sketches ARE the hash sets
    val mAll = inter.agg(count(lit(1)).as("m_all"))
    stats.crossJoin(m).crossJoin(mAll)
      .select(
        when(col("n") < k, col("n"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(HashSpace) /
            col("th").cast("double")))
          .cast("long").as("est_union"),
        when(col("n") < k, col("m_all"))
          .otherwise(floor(col("m").cast("double") * lit(HashSpace) /
            col("th").cast("double")))
          .cast("long").as("est_inter"),
        (col("n") < k).as("exact"))
  }
}
