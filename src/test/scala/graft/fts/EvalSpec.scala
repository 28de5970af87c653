package graft.fts

import graft.SparkSpec

/** IR metrics on hand-computed examples. */
class EvalSpec extends SparkSpec {

  test("nDCG@k matches the hand computation") {
    import spark.implicits._
    val ranked = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "score")
    val qrels = Seq((1L, 1), (3L, 2)).toDF("doc_id", "rel")
    val r = Eval.ndcgAtK(ranked, qrels, 3).collect().head
    // DCG = 1/log2(2) + 0 + 3/log2(4) = 2.5
    // IDCG = 3/log2(2) + 1/log2(3) = 3.6309; nDCG = 2.5/3.6309 = 0.6885
    assert(r.getDouble(0) == 2.5)
    assert(r.getDouble(1) == 3.6309)
    assert(r.getDouble(2) == 0.6885)
    assert(r.getLong(3) == 2L)
  }

  test("nDCG@k of the ideal ranking is 1; of no relevant docs is 0") {
    import spark.implicits._
    val qrels = Seq((1L, 2), (2L, 1)).toDF("doc_id", "rel")
    val ideal = Seq((1L, 2.0), (2L, 1.0)).toDF("doc_id", "score")
    assert(Eval.ndcgAtK(ideal, qrels, 5).collect().head.getDouble(2) == 1.0)
    val none = Seq((9L, 2.0)).toDF("doc_id", "score")
    assert(Eval.ndcgAtK(none, qrels, 1).collect().head.getDouble(2) < 1.0)
    val empty = Eval.ndcgAtK(ideal,
      Seq((1L, 0)).toDF("doc_id", "rel"), 3).collect().head
    assert(empty.getDouble(2) == 0.0 && empty.getLong(3) == 0L)
  }

  test("RBO@k matches the hand computation and its bounds") {
    import spark.implicits._
    val a = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "score")
    val b = Seq((2L, 3.0), (1L, 2.0), (4L, 1.0)).toDF("doc_id", "score")
    val r = Eval.rboAtK(a, b, 3, 0.9).collect().head
    // overlaps by depth: 0, 2, 2 → 0.1·(0 + 0.9·1 + 0.81·2/3) = 0.144
    assert(r.getDouble(0) == 0.144, s"rbo = ${r.getDouble(0)}")
    assert(r.getLong(1) == 2L)
    // identical lists score the truncated-form maximum (1−p^k)·... > same
    val self = Eval.rboAtK(a, a, 3, 0.9).collect().head
    // Σ_{d≤3} 0.1·0.9^(d−1)·1 = 0.1·(1 + 0.9 + 0.81) = 0.271
    assert(self.getDouble(0) == 0.271 && self.getLong(1) == 3L)
    // disjoint lists score 0
    val c = Seq((7L, 1.0), (8L, 0.5)).toDF("doc_id", "score")
    assert(Eval.rboAtK(a, c, 3, 0.9).collect().head.getDouble(0) == 0.0)
  }
}
