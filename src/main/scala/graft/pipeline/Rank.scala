package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank as a DataFrame power iteration — the link-analysis score a
  * curation pipeline uses to weight documents by reference structure
  * (page quality from a hyperlink graph, citation weight, near-dup
  * cluster centrality). GraphX/Pregel is the reference's graph module
  * (SURVEY §0 notes it out of scope as a MODULE); the operator itself is
  * expressible as relational iterations, which is how it runs at 100 TB
  * anyway: each step is one equi-join of the edge list with the current
  * ranks plus one aggregation — shuffle keys stay (src, dst) throughout,
  * so AQE/exchange reuse keeps every iteration on the same partitioning.
  *
  * Semantics (the classic formulation):
  * `r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/out(u) + dangling/N)`
  * with dangling mass (rank of nodes with no out-edges) redistributed
  * uniformly, so Σr = 1 is invariant at every step. Fixed iteration
  * count, no convergence test — deterministic and oracle-replayable.
  *
  * The rank state is one (node, rank) row per node. The edge list is
  * re-read per iteration; in a real deployment it would be written
  * bucketed by `src` once so the per-iteration join is co-located
  * (the q_join_bucketed pattern).
  */
object Rank {

  /** 10-iteration PageRank over `edges(src, dst)` (duplicate edges count
    * as parallel links — weight by multiplicity, like Pregel's default).
    * Output: (node, rank) with rank rounded to 6 for cross-engine
    * reproducibility. */
  def pageRank(edges: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame =
    rankInternal(edges, iters, damping, seeds = Nil)

  /** PERSONALIZED PageRank: teleport lands only on `seeds` (uniformly),
    * so ranks measure proximity TO the seed set through the link
    * structure — topic-sensitive authority (Haveliwala), the retrieval
    * booster for "important relative to these trusted documents".
    * Dangling mass returns to the seeds too (the personalized walk's
    * restart), so mass still conserves. Seeds are a handful of ids by
    * definition — they travel as a broadcast membership column. */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
                           iters: Int = 10,
                           damping: Double = 0.85): DataFrame = {
    require(seeds.nonEmpty, "personalization needs at least one seed")
    rankInternal(edges, iters, damping, seeds)
  }

  private def rankInternal(edges: DataFrame, iters: Int,
                           damping: Double, seeds: Seq[Long]): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist()
      val n = nodes.count()
      if (seeds.nonEmpty) {
        // A seed set disjoint from the graph would make the teleport
        // vector all-zero: ranks decay to 0 each step and the Σrank=1
        // invariant silently breaks. Fail loud instead (seeds are a
        // handful of ids, so this membership probe is a broadcast semi).
        val present = nodes.filter(col("node").isin(seeds: _*)).count()
        require(present == seeds.size,
          s"personalization seeds absent from the graph: ${seeds.size - present} " +
            s"of ${seeds.size} seeds have no vertex (teleport mass would leak)")
      }
      val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("out"))
      // teleport share per node: uniform 1/n, or 1/|seeds| on seeds only
      val teleport =
        if (seeds.isEmpty) lit(1.0 / n)
        else when(col("node").isin(seeds: _*), lit(1.0 / seeds.size))
          .otherwise(lit(0.0))
      var ranks = nodes.withColumn("rank", teleport)
      for (_ <- 1 to iters) {
        val withOut = ranks.join(outDeg,
          ranks("node") === outDeg("src"), "left")
        // mass leaving through edges; nodes with no out-edges are dangling
        val contrib = withOut.filter(col("out").isNotNull)
          .select(col("node"), (col("rank") / col("out")).as("share"))
          .join(e, col("node") === e("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("share")).as("in_mass"))
        val dangling = withOut.filter(col("out").isNull)
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
        ranks = nodes
          .join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("node"),
            (lit(1.0 - damping) * teleport +
              lit(damping) *
                (coalesce(col("in_mass"), lit(0.0)) + col("dm") * teleport))
              .as("rank"))
        // TRUNCATE the lineage each step (localCheckpoint, eager):
        // persist alone caches data but the LOGICAL plan still nests one
        // join tree per iteration, so analysis + janino codegen cost
        // grows superlinearly — by iteration 10 the compile dwarfs the
        // data. After checkpointing, every iteration plans against a
        // constant-size leaf. (Cluster deployments would use
        // checkpoint() on reliable storage for lineage-free recovery.)
        ranks = ranks.localCheckpoint()
      }
      nodes.unpersist()
      // the checkpointed blocks back the returned frame (the rank table
      // is |nodes|-sized — it must STAY distributed)
      ranks.select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy("node")
    } finally e.unpersist()
  }

  /** LABEL PROPAGATION community detection (Raghavan, Albert & Kumara,
    * Phys. Rev. E 2007): every node starts in its own community (label =
    * its id); each SYNCHRONOUS step a node adopts the label held by the
    * weighted majority of its neighbors (the graph is viewed undirected —
    * each edge votes both ways — and parallel edges weight the vote),
    * ties broken by the SMALLEST label. The paper's asynchronous
    * random-order variant is unreproducible across engines by design;
    * the deterministic synchronous form is the one GraphX's
    * LabelPropagation ships too. Fixed iteration count (the paper's
    * stopping rule is also order-dependent), so the oracle unrolls the
    * exact steps.
    *
    * Scale shape per step: one equi-join of the undirected edge list
    * with the current labels + one (node, label) count + one argmax via
    * max(struct(count, −label)) — partial-aggregating, no window, and
    * the shuffle key stays the node id across iterations;
    * localCheckpoint truncates the per-step lineage exactly like
    * [[pageRank]]. Isolated nodes keep their own label. */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    try {
      val nodes = und.select(col("src").as("node")).distinct().persist()
      nodes.count()
      var labels = nodes.withColumn("label", col("node"))
      for (_ <- 1 to iters) {
        val votes = und
          .join(labels.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src"), col("label"))
          .agg(count(lit(1)).as("c"))
        val best = votes.groupBy("src")
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
          .select(col("src").as("node"), (-col("w.nl")).as("new_label"))
        labels = labels.join(best, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("new_label"), col("label")).as("label"))
          .localCheckpoint()
      }
      nodes.unpersist()
      labels.orderBy("node")
    } finally und.unpersist()
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999 — the OTHER classic
    * link-analysis score; PageRank measures global endorsement, HITS
    * separates "points at good pages" from "is pointed at by good
    * hubs"). Synchronous power iteration: a ← Eᵀh then L2-normalize,
    * h ← E·a then L2-normalize, fixed `iters` rounds from the all-ones
    * start — deterministic, oracle-replayable (the oracle unrolls the
    * identical steps as chained CTEs).
    *
    * Scale shape per iteration: two equi-joins of the edge list with a
    * |nodes|-row score frame + two aggregations; shuffle keys stay
    * (src, dst) throughout so exchange reuse applies, and the L2 norm is
    * a 1-row aggregate broadcast back — nothing ever concentrates.
    * localCheckpoint truncates per-step lineage exactly like
    * [[pageRank]]. Nodes without in-edges hold authority 0; without
    * out-edges, hub 0. */
  def hits(edges: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist()
      nodes.count()
      // SPARSE iteration state: nodes with zero auth/hub carry no row —
      // they contribute nothing to either the propagation join or the
      // L2 norm (Σx² over non-zeros equals Σ over all), so the per-
      // iteration node-fill joins the first cut paid (5 joins/iteration,
      // 22 s at sf0.1 — 3.5× pageRank) are pure overhead; the dense fill
      // happens ONCE at output. 2 joins + 2 scalar aggs per iteration.
      def l2normalize(df: DataFrame, c: String): DataFrame = {
        val norm = df.agg(sqrt(sum(col(c) * col(c))).as("l2"))
        df.crossJoin(broadcast(norm))
          .select(col("node"), (col(c) / col("l2")).as(c))
      }
      var hub = nodes.select(col("node"), lit(1.0).as("hub"))
      var auth: DataFrame = null
      for (_ <- 1 to iters) {
        val aRaw = e.join(
            hub.select(col("node").as("src"), col("hub")), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("auth"))
        auth = l2normalize(aRaw, "auth").localCheckpoint()
        val hRaw = e.join(
            auth.select(col("node").as("dst"), col("auth")), "dst")
          .groupBy(col("src").as("node")).agg(sum(col("auth")).as("hub"))
        hub = l2normalize(hRaw, "hub").localCheckpoint()
      }
      val out = nodes
        .join(auth, Seq("node"), "left")
        .join(hub, Seq("node"), "left")
        .na.fill(0.0, Seq("auth", "hub"))
        .select(col("node"), round(col("auth"), 6).as("auth"),
          round(col("hub"), 6).as("hub")).orderBy("node")
      nodes.unpersist()
      out
    } finally e.unpersist()
  }
}
