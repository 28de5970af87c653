package graft.pipeline

import graft.SparkSpec

/** PageRank on hand-computable graphs: mass conservation, dangling
  * redistribution, and the classic hub/authority ordering. */
class RankSpec extends SparkSpec {

  test("ranks sum to 1 and favor the node everyone links to") {
    import spark.implicits._
    // 1→3, 2→3, 3→1 : node 3 collects two links, node 2 gets only
    // teleport. The 1↔3 cycle oscillates with eigenvalue −0.85, so the
    // stationary ordering (3 > 1) only emerges once 0.85^k decays below
    // the stationary gap — 21 iterations leaves it clear of the parity
    // artifact a 10-step cut still shows.
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Rank.pageRank(edges, iters = 21).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-4, s"mass must conserve: $r")
    assert(r(3L) > r(1L) && r(1L) > r(2L), s"3 > 1 > 2 expected: $r")
  }

  test("dangling node's mass redistributes instead of leaking") {
    import spark.implicits._
    // 1→2, 2 has no out-edges: without redistribution Σrank decays
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = Rank.pageRank(edges).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-4, s"mass must conserve: $r")
    assert(r(2L) > r(1L), s"the linked-to node must outrank: $r")
  }

  test("personalized: teleport concentrates rank near the seed set") {
    import spark.implicits._
    // two symmetric islands bridged nowhere: 1↔2 and 3↔4. Uniform PR
    // ranks all four equally; seeding on 1 must rank island {1,2} above
    // island {3,4}, whose only inflow would be teleport it never gets.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val uni = Rank.pageRank(edges).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(uni.values.toSet.size == 1, s"symmetric islands rank equal: $uni")
    val per = Rank.personalizedPageRank(edges, seeds = Seq(1L)).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(per.values.sum - 1.0) < 1e-4, s"mass conserves: $per")
    assert(per(1L) > per(2L), s"the seed itself ranks highest: $per")
    assert(per(2L) > per(3L) && per(3L) == 0.0 && per(4L) == 0.0,
      s"the unseeded island gets no teleport and no inflow: $per")
  }

  test("seeds absent from the graph fail loud instead of leaking mass") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // seed 99 has no vertex: its teleport share would vanish and ranks
    // decay toward 0, silently breaking the documented sum-to-1 invariant
    val e = intercept[IllegalArgumentException] {
      Rank.personalizedPageRank(edges, seeds = Seq(1L, 99L)).collect()
    }
    assert(e.getMessage.contains("seeds absent"))
  }

  test("parallel edges weigh double") {
    import spark.implicits._
    // 1 sends two of three shares to 2, one to 3
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val r = Rank.pageRank(edges).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(2L) > r(3L), s"double edge must outweigh single: $r")
  }

  test("label propagation: blocks converge to min label, ties go small") {
    import spark.implicits._
    // two triangles bridged by nothing + one isolated self-edge node
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),     // community {1,2,3}
      (10L, 11L), (11L, 12L), (12L, 10L), // community {10,11,12}
      (99L, 99L))                        // isolated (self-loop only)
      .toDF("src", "dst")
    val got = Rank.labelPropagation(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L, got.toString)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L, got.toString)
    assert(got(99L) == 99L, "isolated node keeps its own label")
    // parallel edges weight the vote: node 5 hears 20 twice, 30 once
    val weighted = Seq((20L, 5L), (20L, 5L), (30L, 5L),
      (20L, 21L), (30L, 31L)).toDF("src", "dst")
    val w = Rank.labelPropagation(weighted, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(5L) == 20L, s"double edge must win the vote: $w")
    // equal votes break to the SMALLER label
    val tied = Seq((40L, 6L), (50L, 6L)).toDF("src", "dst")
    val t = Rank.labelPropagation(tied, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t(6L) == 40L, s"tie must break small: $t")
  }

  test("hits: authorities collect in-links, hubs collect good out-links") {
    import spark.implicits._
    // 1→3, 2→3, 3→4 : node 3 is the authority (two in-links), nodes 1/2
    // are equal hubs pointing at it; node 4's only in-link comes from a
    // weaker hub, so auth(3) > auth(4). L2 norms are 1 per score vector.
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Rank.hits(edges).collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
    val auth = r.map(t => t._1 -> t._2).toMap
    val hub = r.map(t => t._1 -> t._3).toMap
    assert(auth(3L) > auth(4L) && auth(4L) >= 0.0, auth.toString)
    assert(auth(1L) == 0.0 && auth(2L) == 0.0, "no in-links, no authority")
    assert(math.abs(hub(1L) - hub(2L)) < 1e-9, "symmetric hubs must tie")
    assert(hub(1L) > hub(3L), "pointing at the authority beats pointing away")
    assert(hub(4L) == 0.0, "no out-links, no hub score")
    def l2(m: Map[Long, Double]) = math.sqrt(m.values.map(v => v * v).sum)
    assert(math.abs(l2(auth) - 1.0) < 1e-4 && math.abs(l2(hub) - 1.0) < 1e-4)
  }
}
