package graft.pipeline

import graft.SparkSpec

class HybridSpec extends SparkSpec {

  test("rrfFuse: full-outer ranks, both-list ids first, known answers") {
    import spark.implicits._
    val text = Seq((1L, 0.9), (2L, 0.8)).toDF("doc_id", "score")
    val vec = Seq((2L, 0.95), (3L, 0.5)).toDF("vec_id", "cosim")
    val fused = Hybrid.rrfFuse(text, vec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def rrf(rs: Double*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // id 2 appears in BOTH lists (rank 2 lexical, rank 1 vector)
    assert(fused == Seq(
      (2L, rrf(2, 1)), (1L, rrf(1)), (3L, rrf(2))))
  }

  test("rrfFuse: ties rank deterministically by id") {
    import spark.implicits._
    val a = Seq((5L, 0.7), (3L, 0.7)).toDF("id", "s") // tie → 3 ranks first
    val b = spark.emptyDataset[(Long, Double)].toDF("id", "s")
    val fused = Hybrid.rrfFuse(a, b, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(fused == Seq(3L, 5L))
  }
}
