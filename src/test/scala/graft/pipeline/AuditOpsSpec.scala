package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed checks for the audit-flavored pipeline ops: k-fold
  * balance, winsorized stats, calibration/ECE, readability. */
class AuditOpsSpec extends SparkSpec {

  test("kfoldAssign: per-stratum fold sizes differ by at most one") {
    import spark.implicits._
    val docs = ((0 until 10).map(i => (i.toLong, "en")) ++
      (100 until 107).map(i => (i.toLong, "fr")))
      .toDF("doc_id", "lang")
    val sizes = Sampling.kfoldAssign(docs, "lang", 3, "s")
      .groupBy("lang", "fold").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(sizes.keySet == (for (l <- Seq("en", "fr"); f <- 0 to 2)
      yield (l, f)).toSet)
    // 10 = 4+3+3, 7 = 3+2+2 in some fold order
    assert(sizes.filter(_._1._1 == "en").values.toSeq.sorted == Seq(3L, 3L, 4L))
    assert(sizes.filter(_._1._1 == "fr").values.toSeq.sorted == Seq(2L, 2L, 3L))
    // deterministic: same seed, same assignment
    val again = Sampling.kfoldAssign(docs, "lang", 3, "s")
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1))
    val first = Sampling.kfoldAssign(docs, "lang", 3, "s")
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(again.toMap == first.toMap)
  }

  test("winsorizeStats clamps at the interpolated percentiles") {
    import spark.implicits._
    // 0..10 in one group: p05 = 0.5, p95 = 9.5 ((n−1)·p interpolation)
    val docs = (0 to 10).map(v => ("g", v.toLong)).toDF("grp", "v")
    val r = Curation.winsorizeStats(docs, "grp", "v", 0.05, 0.95)
      .collect().head
    assert(r.getLong(1) == 11L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 9.5)
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L) // 0 and 10 clipped
    // mean = (0.5 + 1 + ... + 9 + 9.5)/11 = 5.0
    assert(r.getDouble(6) == 5.0)
  }

  test("calibration: exact-integer ECE on a hand case") {
    import spark.implicits._
    // bin 0: scores .05,.05 labels F,T → conf .05, acc .5, gap .45
    // bin 9: scores .9,.9 labels T,T → conf .9, acc 1.0, gap .1
    // ece = (2·.45 + 2·.1)/4 = .275
    val scored = Seq((0.05, false), (0.05, true), (0.9, true), (0.9, true))
      .toDF("quality", "y")
    val rows = Classifier.calibration(scored, "quality", "y").collect()
    val byBin = rows.map(r => r.getInt(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toMap
    assert(byBin(0) == ((2L, 0.05, 0.5, 0.45, 0.275)))
    assert(byBin(9) == ((2L, 0.9, 1.0, 0.1, 0.275)))
    // score 1.0 lands in the top bin, not a phantom bin 10
    val top = Classifier.calibration(
      Seq((1.0, true)).toDF("quality", "y"), "quality", "y").collect()
    assert(top.head.getInt(0) == 9)
  }

  test("readability: hand-computed Flesch") {
    import spark.implicits._
    // "spark reads data. it runs!" → words 5, sentences 2,
    // syllables: spark 1, reads 1 (ea run), data 2, it 1, runs 1 = 6
    // flesch = 206.835 − 1.015·2.5 − 84.6·1.2 = 102.78 (exact grid point)
    val d = Seq((1L, "spark reads data. it runs!")).toDF("doc_id", "text")
    val r = TextStats.readability(d).collect().head
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L && r.getLong(3) == 6L)
    assert(r.getDouble(4) == 102.78, s"flesch = ${r.getDouble(4)}")
    // empty doc: NULL flesch, sentence floor at 1
    val e = TextStats.readability(Seq((2L, "")).toDF("doc_id", "text"))
      .collect().head
    assert(e.isNullAt(4) && e.getLong(2) == 1L)
  }

  test("kwic: context windows clamp at document edges") {
    import spark.implicits._
    val d = Seq((1L, "query at start"), (2L, "it ends with query"),
      (3L, "a query b query c")).toDF("doc_id", "text")
    val rows = TextStats.kwic(d, "query", 2).orderBy("doc_id", "i")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, 1, "", "at start"),
      (2L, 4, "ends with", ""),
      (3L, 2, "a", "b query"),
      (3L, 4, "query b", "c")), s"got ${rows.toSeq}")
  }

  test("jsDivergence: identical slices diverge 0, disjoint ln 2") {
    import spark.implicits._
    val same = Seq((true, "a b c"), (false, "a b c")).toDF("p", "text")
    val r0 = TextStats.jsDivergence(same, col("p")).collect().head
    assert(r0.getDouble(2) == 0.0)
    val disj = Seq((true, "a a b"), (false, "c d e")).toDF("p", "text")
    val r1 = TextStats.jsDivergence(disj, col("p")).collect().head
    assert(r1.getDouble(2) == 0.6931, s"jsd = ${r1.getDouble(2)}")
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 3L)
  }
}
