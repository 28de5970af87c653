package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed BLEU / ROUGE checks (the sacrebleu worked examples). */
class EvalTextSpec extends SparkSpec {

  private def pairsDf(rows: Seq[(Long, Seq[String], Seq[String])]) = {
    import spark.implicits._
    rows.toDF("pid", "cand", "ref")
  }

  test("bleu: clipped precision, geometric mean, brevity penalty") {
    // cand 'the the the cat' vs ref 'the cat sat':
    // p1 = (min(3,1)+min(1,1))/4 = 0.5; p2 = 1/3 ('the cat');
    // c=4 >= r=3 so BP=1; BLEU-2 = sqrt(0.5/3) = 0.4082
    val r = EvalText.bleu(
      pairsDf(Seq((1L, Seq("the", "the", "the", "cat"),
        Seq("the", "cat", "sat")))), maxN = 2).collect().head
    assert(r.getAs[Double]("p1") == 0.5)
    assert(r.getAs[Double]("p2") == 0.3333)
    assert(r.getAs[Long]("c_len") == 4L && r.getAs[Long]("r_len") == 3L)
    assert(r.getAs[Double]("bp") == 1.0)
    assert(r.getAs[Double]("bleu") == 0.4082)
  }

  test("bleu: zero n-gram overlap zeroes the score; short cand pays BP") {
    // no shared bigram -> p2 = 0 -> bleu = 0 even though p1 > 0
    val r = EvalText.bleu(
      pairsDf(Seq((1L, Seq("cat", "the"), Seq("the", "cat", "sat")))),
      maxN = 2).collect().head
    assert(r.getAs[Double]("bleu") == 0.0)
    assert(r.getAs[Double]("bp") == math.floor(
      math.exp(1.0 - 3.0 / 2.0) * 10000 + 0.5) / 10000 ||
      math.abs(r.getAs[Double]("bp") - math.exp(-0.5)) < 1e-3)
  }

  test("rougeN: per-pair precision/recall/F1; short docs yield 0 grams") {
    val out = EvalText.rougeN(
      pairsDf(Seq(
        (1L, Seq("the", "the", "the", "cat"), Seq("the", "cat", "sat")),
        (2L, Seq("x"), Seq("y", "z")))),
      Seq(1, 2)).orderBy("pid", "n").collect()
    val r11 = out(0) // pid 1, n=1: m=2, c=4, r=3
    assert(r11.getAs[Long]("matched") == 2L)
    assert(r11.getAs[Double]("precision") == 0.5)
    assert(r11.getAs[Double]("recall") == 0.6667)
    assert(r11.getAs[Double]("f1") == 0.5714) // 4/7
    val r12 = out(1) // n=2: m=1, c=3, r=2
    assert(r12.getAs[Long]("matched") == 1L)
    assert(r12.getAs[Double]("f1") == 0.4)
    val r22 = out(3) // pid 2, n=2: cand has no bigram
    assert(r22.getAs[Long]("cand_total") == 0L)
    assert(r22.getAs[Long]("matched") == 0L)
    assert(r22.getAs[Double]("f1") == 0.0)
  }
}
