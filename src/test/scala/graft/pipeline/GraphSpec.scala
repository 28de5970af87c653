package graft.pipeline

import graft.SparkSpec

/** Structural graph operators on hand-checkable graphs. */
class GraphSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("linkPrediction: CN/Jaccard/Adamic-Adar by hand on a 5-node graph") {
    // 1-2, 1-3, 2-3, 2-4, 3-4: predict 1-4 (shared z ∈ {2,3}, both deg 3)
    val g = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val r = Graph.linkPrediction(g, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(r.length == 1, r.mkString(","))
    val (a, b, cn, jac, aa) = r.head
    assert((a, b, cn) == (1L, 4L, 2L))
    // deg(1) = 2, deg(4) = 2 → jaccard = 2 / (2 + 2 - 2) = 1.0
    assert(jac == 1.0)
    assert(math.abs(aa - math.rint(2.0 / math.log(3.0) * 1e4) / 1e4) < 1e-12)
  }

  test("linkPrediction: hubCap drops high-degree bridges; existing edges excluded") {
    // star: hub 9 connects 1..4; also edge 1-2. Shared-neighbor pairs all
    // go through the hub (deg 4); capping at 3 leaves no candidates.
    val star = edges(9L -> 1L, 9L -> 2L, 9L -> 3L, 9L -> 4L, 1L -> 2L)
    assert(Graph.linkPrediction(star, k = 10, hubCap = 3).count() == 0)
    val all = Graph.linkPrediction(star, k = 10, hubCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pair (1,2) is an EXISTING edge — must not be predicted
    assert(!all.contains((1L, 2L)) && all.contains((3L, 4L)))
    // duplicate/self/reversed edges normalize away
    val messy = edges(1L -> 2L, 2L -> 1L, 1L -> 1L, 1L -> 3L)
    val m = Graph.linkPrediction(messy, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(m == List((2L, 3L, 1L))) // via z = 1, once
  }

  test("kCore: peel cascades — removing leaves collapses the chain") {
    // triangle 1-2-3 plus a path 3-4-5: 2-core = the triangle only, and
    // node 4 (degree 2 initially) must fall AFTER 5 falls — two peels.
    val g = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    val r = Graph.kCore(g, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), r.toString)
    // k = 3: the triangle is only 2-connected → empty core
    assert(Graph.kCore(g, k = 3).count() == 0)
    // k = 1 keeps everything with its full degree
    val k1 = Graph.kCore(g, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k1(3L) == 3L && k1(5L) == 1L)
  }
}
