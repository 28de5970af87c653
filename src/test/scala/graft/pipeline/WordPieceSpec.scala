package graft.pipeline

import graft.SparkSpec

/** WordPiece trainer/encoder: the likelihood-gain merge objective, '##'
  * marker discipline, greedy longest-match serving, [UNK] fallback. */
class WordPieceSpec extends SparkSpec {

  test("merge objective picks likelihood gain, not raw pair frequency") {
    import spark.implicits._
    // 'ab'×4 and 'xy'×3 with 'a','b' also frequent alone ('az'×6, 'qb'×6):
    // pair (a,##b) has freq 4 but f(a)=10, f(##b)=10 → score 4/100;
    // (x,##y) has freq 3 with f(x)=f(##y)=3 → score 3/9. WordPiece must
    // merge xy first; frequency-greedy BPE would pick ab.
    val docs = Seq((1L, ("ab " * 4) + ("xy " * 3) + ("az " * 6) +
      ("qb " * 6))).toDF("doc_id", "text")
    val m = Bpe.trainWordPiece(docs, numMerges = 1)
    assert(m.vocab.contains("xy") && !m.vocab.contains("ab"),
      m.vocab.toString)
  }

  test("greedy longest-match encodes with ## continuations; [UNK] on OOV") {
    import spark.implicits._
    val docs = Seq((1L, "hello hello hello hell")).toDF("doc_id", "text")
    val m = Bpe.trainWordPiece(docs, numMerges = 10)
    val enc = Bpe.encodeWordPiece("hello", m)
    assert(enc.map(_.stripPrefix("##")).mkString == "hello")
    assert(!enc.head.startsWith("##") && enc.tail.forall(_.startsWith("##")))
    // characters never seen in training collapse the word to [UNK]
    assert(Bpe.encodeWordPiece("zzz", m) == Seq("[UNK]"))
  }

  test("training is deterministic and round-trips the corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark query spark table merge window"),
      (2L, "query window merge spark data data")).toDF("doc_id", "text")
    val m1 = Bpe.trainWordPiece(docs, numMerges = 8)
    val m2 = Bpe.trainWordPiece(docs, numMerges = 8)
    assert(m1.vocab == m2.vocab)
    val words = Seq("spark", "query", "table", "merge", "window", "data")
    words.foreach { w =>
      val enc = Bpe.encodeWordPiece(w, m1)
      assert(enc.map(_.stripPrefix("##")).mkString == w, s"$w -> $enc")
      assert(enc.size <= w.length)
    }
  }
}
