package graft.fts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IR EVALUATION METRICS — the measurement half of a search engine
  * (Lucene ships this as the `benchmark`/judge surface; TREC tooling as
  * trec_eval). A ranking operator without its metric is unfalsifiable at
  * scale: these run IN-ENGINE so a 100 TB corpus evaluates its own
  * serving quality as a query (ranked lists are top-k — coordinator
  * sized — so every join below is broadcast-shaped; nothing here touches
  * corpus-scale data beyond the qrels derivation the caller supplies).
  *
  * Determinism: ranks are assigned over (rounded score DESC, doc_id) —
  * the same total order the ranking queries publish — so an external
  * engine replays the metric bit-for-bit.
  */
object Eval {

  /** The top-k prefix of a scored list under the (score DESC, doc_id)
    * total order, with its 1-based rank. The cut happens FIRST via
    * ORDER BY + LIMIT — planned as TakeOrderedAndProject (per-partition
    * bounded heaps, driver merge), never a global sort — so the
    * single-partition row_number window that assigns ranks runs over at
    * most k rows BY CONSTRUCTION, whatever size the caller hands in.
    * (Previously the window ran directly on the input and only a
    * doc-comment promised it was top-k.) */
  private def rankTopK(scored: DataFrame, k: Int, rankCol: String): DataFrame =
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn(rankCol, row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))

  /** nDCG@k (Järvelin & Kekäläinen 2002, the graded-relevance ranking
    * metric): DCG@k = Σ_{r≤k} (2^rel − 1)/log2(r+1) over the ranked
    * list's positions, normalized by the ideal DCG@k — the DCG of the
    * qrels' grades sorted descending. One output row.
    *
    * `ranked`: (doc_id, score) — scored candidates, any size; ranks are
    * taken over (score DESC, doc_id) and cut at k here.
    * `qrels`: (doc_id, rel) graded relevance, rel ≥ 0 integers.
    *
    * The ranked list is k rows after the cut and IDCG needs only the
    * grade HISTOGRAM's top-k prefix — both coordinator-scale regardless
    * of corpus size; [[rankTopK]] enforces the cut-before-window order,
    * so the single-partition rank window never sees more than k rows
    * even when the caller hands in a corpus-scale scored frame. */
  def ndcgAtK(ranked: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val rk = rankTopK(ranked, k, "rank")
    val dcg = rk.join(qrels, Seq("doc_id"), "left_outer")
      .na.fill(0, Seq("rel"))
      .agg(coalesce(sum((pow(lit(2.0), col("rel")) - 1.0) /
        log(2.0, col("rank") + 1.0)), lit(0.0)).as("dcg"))
    // ideal ranking = grades sorted desc; position i (1-based) of the
    // ideal list holds grade g iff i ≤ (count of grades ≥ g) and
    // i > (count of grades > g) — the histogram prefix, no sort of the
    // qrels needed (they may be corpus-scale)
    val hist = qrels.filter(col("rel") > 0)
      .groupBy("rel").agg(count(lit(1)).as("n"))
      .withColumn("above", coalesce(sum(col("n")).over(
        Window.orderBy(col("rel").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val pos = rk.sparkSession.range(1, k + 1).toDF("i")
    val idcg = pos.join(hist,
        col("i") > col("above") && col("i") <= col("above") + col("n"))
      .agg(coalesce(sum((pow(lit(2.0), col("rel")) - 1.0) /
        log(2.0, col("i") + 1.0)), lit(0.0)).as("idcg"))
    val nRel = qrels.filter(col("rel") > 0)
      .agg(count(lit(1)).as("n_rel"))
    dcg.crossJoin(idcg).crossJoin(nRel)
      .select(round(col("dcg"), 4).as("dcg"),
        round(col("idcg"), 4).as("idcg"),
        round(when(col("idcg") > 0.0, col("dcg") / col("idcg"))
          .otherwise(0.0), 4).as("ndcg"),
        col("n_rel"))
  }

  /** MRR@k over a batch of queries (the navigational-search headline:
    * mean of 1/rank-of-first-relevant, 0 when nothing relevant lands in
    * the top k). Engine-portable by the integer-space trick: reciprocal
    * ranks scale by lcm(1..k) to EXACT integers, so the cross-query mean
    * never accumulates floats (1/3 + 1/7 in doubles is summation-order
    * sensitive; 840 + 360 is not) — one final division, floor-form
    * rounded. Output: one row per query (first relevant rank, its RR)
    * with the corpus MRR replicated, plus the qid order.
    *
    * `runs`: (qid, ranked(doc_id, score), relevant(doc_id)). Each ranked
    * list is cut to k here via the (score DESC, doc_id) total order. */
  def mrrAtK(runs: Seq[(Int, DataFrame, DataFrame)], k: Int): DataFrame = {
    require(runs.nonEmpty && k >= 1, "need runs and k ≥ 1")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1L to k.toLong).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val firsts = runs.map { case (qid, ranked, rel) =>
      rankTopK(ranked, k, "rank")
        .join(rel.select("doc_id"), Seq("doc_id"), "left_semi")
        .agg(min(col("rank")).as("first_rel_rank"))
        .select(lit(qid).as("qid"), col("first_rel_rank"))
    }.reduce(_ unionByName _)
    val rr = firsts.withColumn("rr_int",
      when(col("first_rel_rank").isNotNull, lit(lcm) / col("first_rel_rank"))
        .otherwise(0L).cast("long"))
    val m = rr.agg(sum(col("rr_int")).as("rr_sum"),
      count(lit(1)).as("nq"))
    rr.crossJoin(broadcast(m))
      .select(col("qid"), col("first_rel_rank"),
        graft.core.Num.roundHalfUp(
          col("rr_int").cast("double") / lcm.toDouble, 4).as("rr"),
        graft.core.Num.roundHalfUp(
          col("rr_sum").cast("double") / (col("nq") * lcm).cast("double"), 4)
          .as("mrr"))
      .orderBy("qid")
  }

  /** Rank-biased overlap, truncated at depth k (Webber, Moffat & Zobel
    * 2010 — the top-weighted similarity between two rankings; unlike
    * Kendall's tau it handles non-conjoint lists, which is exactly the
    * two-rankers-on-one-corpus comparison): RBO@k = (1−p)·Σ_{d≤k}
    * p^(d−1)·|A_d ∩ B_d|/d, where A_d is the depth-d prefix. This is the
    * bounded prefix sum of the paper's eq. 4 (the min guarantee), the
    * form two top-k serving lists can compute without corpus access.
    *
    * `a`, `b`: (doc_id, score) ranked lists; prefixes via the same
    * (score DESC, doc_id) total order. Everything is ≤ k² pairs. */
  def rboAtK(a: DataFrame, b: DataFrame, k: Int, p: Double): DataFrame = {
    require(k >= 1 && p > 0.0 && p < 1.0, "need k ≥ 1, p in (0,1)")
    def ranks(df: DataFrame, c: String) =
      rankTopK(df, k, c).select(col("doc_id"), col(c))
    val ra = ranks(a, "ra")
    val rb = ranks(b, "rb")
    val joined = ra.join(rb, "doc_id")
      .select(greatest(col("ra"), col("rb")).as("first_depth"))
    val depths = a.sparkSession.range(1, k + 1).toDF("d")
    // overlap at depth d = docs whose max(rank_a, rank_b) ≤ d
    val agreement = depths.join(joined, col("first_depth") <= col("d"),
        "left_outer")
      .groupBy("d").agg(count(col("first_depth")).as("overlap"))
    agreement
      .agg(round(sum(pow(lit(p), col("d") - 1.0) * (lit(1.0) - p) *
          col("overlap").cast("double") / col("d")), 4).as("rbo"),
        max(when(col("d") === k, col("overlap"))).as("overlap_k"))
  }
}
