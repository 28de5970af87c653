package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed two-level prefix sum must equal the sequential packing
  * exactly — bins, counts, totals — and respect the start-bin contract. */
class PackingSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    // lengths chosen so several docs straddle bin boundaries at budget 100
    (1L to 57L).map(i => (i, "x" * (((i * 131) % 700) + 20).toInt))
      .toDF("doc_id", "text")
  }

  /** Sequential reference: exclusive prefix sum over doc_id order. */
  private def reference(budget: Long): Map[Long, (Long, Long, Long, Long)] = {
    val toks = docs.select(col("doc_id"),
        ceil(length(col("text")).cast("double") / 4.0).cast("long").as("toks"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    toks.map { case (id, t) =>
      val bin = cum / budget
      cum += t
      (id, t, bin)
    }.groupBy(_._3).map { case (bin, rows) =>
      bin -> (rows.length.toLong, rows.map(_._2).sum,
        rows.map(_._1).min, rows.map(_._1).max)
    }
  }

  test("distributed packing equals the sequential prefix sum") {
    val got = Packing.packByBudget(docs, 100L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == reference(100L))
  }

  test("bins are increasing and doc ranges do not interleave") {
    // bin ids may legitimately skip (a doc larger than the budget spans
    // several bins, leaving the covered ids empty) but must be strictly
    // increasing with non-overlapping doc ranges
    val rows = Packing.packByBudget(docs, 100L).collect()
    rows.map(_.getLong(0)).sliding(2).foreach {
      case Array(a, b) => assert(a < b)
      case _ =>
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3)) // last < next first
      case _ =>
    }
  }

  test("a bin never starts past the budget frontier (overflow ≤ 1 doc)") {
    // every bin's token total minus its LAST doc's tokens must be < budget:
    // only the straddling final doc may push a bin over
    val budget = 100L
    val perDoc = docs.select(col("doc_id"),
        ceil(length(col("text")).cast("double") / 4.0).cast("long").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Packing.packByBudget(docs, budget).collect().foreach { r =>
      assert(r.getLong(2) - perDoc(r.getLong(4)) < budget)
    }
  }
}
