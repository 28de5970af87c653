package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV/theta-sketch set cardinality: accuracy within the ~1/√k bound on
  * known-overlap sets, exact mode below k, and the bounded-plan shape. */
class KmvSpec extends SparkSpec {

  test("distinct and intersection estimates land within the error bound") {
    import spark.implicits._
    val k = 256
    // |A| = 8000 (ids 0..7999), |B| = 8000 (ids 4000..11999) → true
    // union 12000, intersection 4000
    val a = (0L until 8000L).toDF("id")
    val b = (4000L until 12000L).toDF("id")
    val ska = Kmv.sketch(a, "id", k)
    val skb = Kmv.sketch(b, "id", k)
    val da = Kmv.distinctEstimate(ska, k).collect()(0)
    assert(!da.getBoolean(1), "8000 distinct must be estimation mode")
    assert(math.abs(da.getLong(0) - 8000L) < 8000 * 0.2,
      s"distinct estimate too far: ${da.getLong(0)}")
    val est = Kmv.setEstimates(ska, skb, k).collect()(0)
    val (eu, ei) = (est.getLong(0), est.getLong(1))
    assert(!est.getBoolean(2))
    assert(math.abs(eu - 12000L) < 12000 * 0.2, s"union estimate $eu")
    assert(math.abs(ei - 4000L) < 4000 * 0.35, s"intersection estimate $ei")
    // disjoint sets: intersection estimate collapses to (near) zero
    val c = (100000L until 108000L).toDF("id")
    val skc = Kmv.sketch(c, "id", k)
    val disj = Kmv.setEstimates(ska, skc, k).collect()(0).getLong(1)
    assert(disj < 4000 * 0.05, s"disjoint estimate should be ~0, got $disj")
  }

  test("under-filled sketches return exact counts (exact mode)") {
    import spark.implicits._
    val k = 64
    val a = (0L until 40L).toDF("id")
    val b = (20L until 60L).toDF("id")
    val da = Kmv.distinctEstimate(Kmv.sketch(a, "id", k), k).collect()(0)
    assert(da.getLong(0) == 40L && da.getBoolean(1))
    val est = Kmv.setEstimates(
      Kmv.sketch(a, "id", k), Kmv.sketch(b, "id", k), k).collect()(0)
    assert(est.getLong(0) == 60L && est.getLong(1) == 20L && est.getBoolean(2),
      est.toString)
  }

  test("sketch plans as a bounded per-partition heap, not a global sort") {
    val orders = spark.read.parquet(sf("orders"))
    val plan = Kmv.sketch(orders, "o_custkey", 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sketch must use the top-k heap path:\n${plan.take(1200)}")
    // guard: tiny k rejected
    intercept[IllegalArgumentException](Kmv.sketch(orders, "o_custkey", 4))
  }
}
