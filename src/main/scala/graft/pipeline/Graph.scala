package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural graph operators over a relational edge list — the
  * neighborhood-statistics family complementing [[Rank]] (iteration
  * weights) and [[Components]] (connectivity): link prediction for
  * recommend-a-connection / knowledge-graph completion over a document
  * reference graph, and k-core decomposition for dense-subgraph mining
  * (spam farms and boilerplate rings in a hyperlink corpus are exactly
  * high-core clusters).
  *
  * Both run as joins + aggregations on `edges(src, dst)` with the
  * shuffle key pinned to node ids — at 100 TB the edge list lives
  * bucketed by node (the q_join_bucketed layout) and every step below is
  * co-located.
  */
object Graph {

  /** Undirected simple-graph normalization: drop self-loops, orient each
    * edge (min, max), dedupe. */
  private def simple(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()

  /** LINK PREDICTION by neighborhood overlap (Liben-Nowell & Kleinberg
    * 2003): for node pairs NOT already connected, score the likelihood of
    * a future edge by their common neighborhood — common-neighbor count,
    * Jaccard overlap, and Adamic-Adar (common neighbors weighted
    * 1/ln(degree): a shared rare neighbor is stronger evidence than a
    * shared hub). Returns the top-k pairs by (Adamic-Adar, pair id).
    *
    * Scale shape: candidate pairs are generated ONLY through shared
    * neighbors (two-hop join on the neighbor id) — never all-pairs — so
    * the cost is Σ_z deg(z)², bounded by `hubCap`: a neighbor with degree
    * above the cap is skipped as a BRIDGE (a hub shared by everyone
    * predicts nothing — the standard Adamic-Adar practice — and at corpus
    * scale one hot hub would otherwise quadratically dominate the
    * shuffle). Degrees and the existing-edge anti-join are edge-list
    * aggregations; nothing materializes beyond candidate pairs. */
  def linkPrediction(edges: DataFrame, k: Int, hubCap: Int = 50): DataFrame = {
    require(k >= 1, "k must be positive")
    require(hubCap >= 2, "hubCap below 2 prunes every common neighbor")
    val e = simple(edges)
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // neighbor lists keyed by the shared endpoint z, hub-capped
    val byZ = und.select(col("b").as("z"), col("a").as("n"))
      .join(deg.select(col("node").as("z"), col("deg").as("degz"))
        .filter(col("degz") <= hubCap), "z")
    val pairs = byZ.select(col("z"), col("degz"), col("n").as("a"))
      .join(byZ.select(col("z"), col("n").as("b")), "z")
      .filter(col("a") < col("b"))
    val scored = pairs.groupBy("a", "b").agg(
      count(lit(1)).as("cn"),
      sum(lit(1.0) / log(col("degz").cast("double"))).as("aa"))
    val fresh = scored.join(e, Seq("a", "b"), "left_anti")
    fresh
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
      .select(col("a"), col("b"), col("cn"),
        round(col("cn").cast("double") /
          (col("dega") + col("degb") - col("cn")).cast("double"), 4).as("jaccard"),
        round(col("aa"), 4).as("adamic_adar"))
      .orderBy(col("adamic_adar").desc, col("a"), col("b")).limit(k)
  }

  /** K-CORE decomposition (Seidman 1983) by iterative peeling: repeatedly
    * delete nodes of degree < k until every survivor has degree ≥ k in
    * the surviving subgraph. Returns `(node, core_deg)` — members of the
    * k-core with their within-core degree.
    *
    * Each peel is one degree aggregation + two semi-joins of the edge
    * list against the survivor set, all keyed on node ids;
    * localCheckpoint truncates per-iteration lineage (the [[Rank]]
    * pattern). The loop stops when an iteration deletes nothing — the
    * fixture converges in a handful of peels, and each extra peel at
    * scale is a linear pass, never quadratic. `maxIters` bounds the loop
    * (peeling strictly shrinks the node set, so it always terminates;
    * the bound is a lineage-safety valve). */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 50): DataFrame = {
    require(k >= 1, "k must be positive")
    val e = simple(edges)
    var und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var survivors = und.select(col("a")).distinct().count()
    var it = 0
    var stable = false
    while (!stable && it < maxIters) {
      val keep = und.groupBy("a").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("a")
      val pruned = und
        .join(keep, "a")
        .join(keep.select(col("a").as("b")), "b")
        .select("a", "b")
        .localCheckpoint()
      val n = pruned.select(col("a")).distinct().count()
      stable = n == survivors
      survivors = n
      und = pruned
      it += 1
    }
    und.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k) // empty-graph guard: no survivors → no rows
      .orderBy("node")
  }
}
