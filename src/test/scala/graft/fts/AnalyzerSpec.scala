package graft.fts

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests for the frozen token grammar (SURVEY.md §7 risk 3:
  * tokenization must be deterministic, null-safe, and idempotent — the index
  * and the query side must always agree). Uses scalacheck Gen directly with
  * a fixed seed (the scalatest-scalacheck bridge isn't in the offline deps).
  */
class AnalyzerSpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 40)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def tokensOf(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t").select(Analyzer.tokenize(col("t")).as("toks"))
      .collect()(0).getSeq[String](0)
  }

  test("tokenize: basic split, lowercase, drops empties") {
    assert(tokensOf("Hello,  WORLD!! 42") == Seq("hello", "world", "42"))
    assert(tokensOf("") == Seq.empty)
    assert(tokensOf("...---...") == Seq.empty)
  }

  test("tokenize: null-safe") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("t")
      .select(Analyzer.tokenize(col("t")).as("toks")).collect()(0)
    assert(r.isNullAt(0))
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("tokenize is idempotent over its own output (property)") {
    forAll(text) { s =>
      val once = tokensOf(s)
      val twice = tokensOf(once.mkString(" "))
      assert(once == twice)
    }
  }

  test("tokenize is case-insensitive (property)") {
    forAll(text) { s => assert(tokensOf(s) == tokensOf(s.toUpperCase)) }
  }

  test("shingles: count and guard for short docs") {
    import spark.implicits._
    def sh(toks: Seq[String], n: Int): Seq[String] =
      Seq(toks).toDF("t").select(Analyzer.shingles(col("t"), n).as("s"))
        .collect()(0).getSeq[String](0)
    assert(sh(Seq("a", "b", "c", "d"), 3) == Seq("a b c", "b c d"))
    assert(sh(Seq("a", "b"), 3) == Seq.empty) // shorter than n → empty, not DESC sequence
    assert(sh(Seq("x", "x", "x", "x"), 2) == Seq("x x")) // distinct
  }
}
