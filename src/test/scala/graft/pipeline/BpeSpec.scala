package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE training and encoding on hand-computable corpora — the merge-table
  * ground truth the engine-specific q_text_bpe verdict row rests on. */
class BpeSpec extends SparkSpec {

  test("train learns the classic argmax merge and stops when pairs dry up") {
    import spark.implicits._
    // hist: ab×3, ac×1 → pair (a,b)=3 wins; after merging, only (a,c)=1
    // remains, below the ≥2 support floor → training stops at one merge
    // even with budget left
    val docs = Seq((1L, "ab ab ab ac")).toDF("doc_id", "text")
    assert(Bpe.train(docs, numMerges = 5) == Seq(("a", "b")))
  }

  test("merge-selection ties break lexicographically (deterministic)") {
    import spark.implicits._
    // (a,b)=2 and (c,d)=2 tie → (a,b) first, then (c,d) next round
    val docs = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    assert(Bpe.train(docs, numMerges = 2) == Seq(("a", "b"), ("c", "d")))
  }

  test("merges compose: learned pieces feed later pair counts") {
    import spark.implicits._
    // abc×3: round 1 (a,b)=3 vs (b,c)=3 → tie, (a,b) wins; round 2 the
    // SURVIVING pair is (ab,c)=3 → merge to 'abc'
    val docs = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    assert(Bpe.train(docs, numMerges = 2) == Seq(("a", "b"), ("ab", "c")))
  }

  test("encodeWord applies merges in rank order, exhaustively") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    assert(Bpe.encodeWord("abcab", merges) == Seq("abc", "ab"))
    assert(Bpe.encodeWord("abab", merges) == Seq("ab", "ab"))
    assert(Bpe.encodeWord("xyz", merges) == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("ab", Nil) == Seq("a", "b"))
  }

  test("applyMerges round-trips every word and bounds piece count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark sparks sharded"),
      (2L, "spark shards")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 10)
    val enc = Bpe.applyMerges(Bpe.words(docs), merges)
    val rows = enc.select(col("word"), col("pieces"), col("n_pieces"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString("") == word, s"round-trip failed for $word")
      assert(r.getInt(2) == pieces.size && pieces.size <= word.length)
    }
    // frequent word compresses: 'spark' (freq 2) must be fewer pieces
    // than characters after 10 merges on this corpus
    val sparkPieces = rows.find(_.getString(0) == "spark").get.getInt(2)
    assert(sparkPieces < "spark".length)
  }
}
