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
  * The rank state is one (node, rank) row per node. Two edge-access
  * modes: the ad-hoc path persists the edge frame (fine while edges fit
  * executor memory), and the LAYOUT path ([[writeEdgeLayout]]) reads a
  * one-time bucketed parquet write — at 100 TB edge scale persist() is
  * executor-memory-bound and every iteration re-shuffles one join side,
  * whereas the bucketed layout's scan already satisfies the join's
  * hash distribution, so each iteration's edge-side join plans with NO
  * Exchange (the q_join_bucketed pattern applied to graph state; the
  * shuffle happened once at write time).
  */
object Rank {

  /** The two orientations of a persisted edge layout: [[hits]]'s auth
    * step joins edges on `src`, its hub step on `dst` (and [[pageRank]]
    * only on `src`) — a real graph store keeps both (GraphX's routing
    * tables, a warehouse's dual-sorted link tables) so EVERY iteration
    * join finds its key pre-bucketed. */
  final case class EdgeLayout(bySrc: DataFrame, byDst: DataFrame)

  /** One-time bucketed write of `edges(src, dst)` under `path`,
    * registered as `<name>_by_src` / `<name>_by_dst`. The repartition
    * on the bucket key before bucketBy yields exactly one file per
    * bucket (the sorted-scan-friendly layout, no nPart×buckets
    * fragments). Iterative consumers read the returned tables and plan
    * their edge-side joins exchange-free (asserted in PlanShapeSpec). */
  def writeEdgeLayout(edges: DataFrame, path: String, name: String,
                      buckets: Int = 32): EdgeLayout = {
    val s = edges.sparkSession
    val norm = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    def side(key: String): DataFrame = {
      val tbl = s"${name}_by_$key"
      norm.repartition(buckets, col(key))
        .write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$path/by_$key")
        .saveAsTable(tbl)
      s.table(tbl)
    }
    EdgeLayout(side("src"), side("dst"))
  }

  /** [[pageRank]] over a persisted [[EdgeLayout]]: identical semantics
    * and output, but the edge list is the bucketed-by-src table — no
    * executor-memory persist (the layout IS the cache) and the
    * per-iteration contribution join keeps the edge side exchange-free
    * (the merge hint pins the shuffle join; broadcasting a corpus-scale
    * rank state is exactly what the layout exists to avoid). */
  def pageRankOnLayout(layout: EdgeLayout, iters: Int = 10,
                       damping: Double = 0.85): DataFrame =
    rankInternal(layout.bySrc, iters, damping, seeds = Nil,
      layoutBacked = true)

  /** [[hits]] over a persisted [[EdgeLayout]] — auth propagation joins
    * the by-src table, hub propagation the by-dst table, both
    * exchange-free on the edge side. */
  def hitsOnLayout(layout: EdgeLayout, iters: Int = 10): DataFrame =
    hitsInternal(layout.bySrc, layout.byDst, iters, layoutBacked = true)

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
                           damping: Double, seeds: Seq[Long],
                           layoutBacked: Boolean = false): DataFrame = {
    require(iters >= 1, "at least one iteration")
    // layout-backed edges are already (long, long), already bucketed and
    // already on disk — persisting them would re-materialize the whole
    // edge list into executor memory for no plan benefit
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val e = if (layoutBacked) e0 else e0.persist()
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
          // layout mode pins the shuffle join: the bucketed edge scan
          // already satisfies hashpartitioning(src), so SMJ plans with
          // no Exchange on the edge side — and broadcasting a
          // corpus-scale rank state is what the layout exists to avoid
          .join(if (layoutBacked) e.hint("merge") else e,
            col("node") === e("src"))
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
    try hitsInternal(e, e, iters, layoutBacked = false)
    finally e.unpersist()
  }

  /** The propagation loop shared by [[hits]] (one persisted frame serves
    * both orientations) and [[hitsOnLayout]] (each step's join reads the
    * edge table bucketed on ITS key, merge-pinned so the edge side plans
    * exchange-free). */
  private def hitsInternal(eSrc: DataFrame, eDst: DataFrame, iters: Int,
                           layoutBacked: Boolean): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val eS = if (layoutBacked) eSrc.hint("merge") else eSrc
    val eD = if (layoutBacked) eDst.hint("merge") else eDst
    val nodes = eSrc.select(col("src").as("node"))
      .union(eSrc.select(col("dst").as("node"))).distinct().persist()
    nodes.count()
    locally {
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
        val aRaw = eS.join(
            hub.select(col("node").as("src"), col("hub")), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("auth"))
        auth = l2normalize(aRaw, "auth").localCheckpoint()
        val hRaw = eD.join(
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
    }
  }
}
