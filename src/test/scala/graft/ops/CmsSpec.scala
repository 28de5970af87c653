package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch invariants. */
class CmsSpec extends SparkSpec {

  test("estimates never undercount; exact at collision-free width") {
    import spark.implicits._
    val occ = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c") ++
      Seq("d", "e", "f", "g", "h")).toDF("k")
    val truth = occ.groupBy("k").agg(count(lit(1)).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = occ.select(col("k")).distinct()
    // wide sketch: 8 keys in w=4096 → collisions vanishingly unlikely,
    // every estimate is exact
    val wide = Cms.estimate(Cms.sketch(occ, "k", 4, 4096), keys, "k", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) => assert(wide(k) == t, s"$k: ${wide(k)} vs $t") }
    // narrow sketch: w=2 forces collisions — estimates may only move UP
    val narrow = Cms.estimate(Cms.sketch(occ, "k", 2, 2), keys, "k", 2, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(narrow(k) >= t, s"$k undercounted: ${narrow(k)} < $t")
    }
    // and at least one must actually collide at w=2 with 8 keys
    assert(truth.exists { case (k, t) => narrow(k) > t },
      "no collision at w=2 — sketch is not counting rows")
  }

  test("sketch state is bounded by d·w regardless of input size") {
    import spark.implicits._
    val occ = (1 to 5000).map(i => s"k${i % 997}").toDF("k")
    val sk = Cms.sketch(occ, "k", 3, 16)
    assert(sk.count() <= 3 * 16)
    // an unqueried slot contributes 0 to an absent key's estimate
    val ghost = Seq("never-seen-key").toDF("k")
    val est = Cms.estimate(sk, ghost, "k", 3, 16).collect()(0).getLong(1)
    // a ghost key's slots are almost surely occupied at this density, so
    // the estimate is a pure collision artifact — still never negative
    assert(est >= 0)
  }
}
