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
}
