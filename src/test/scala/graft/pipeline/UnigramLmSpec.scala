package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unigram-LM tokenizer semantics on a hand-checkable corpus. */
class UnigramLmSpec extends SparkSpec {

  test("viterbi: repeated bigram becomes a learned multi-char piece") {
    import spark.implicits._
    // 'ab' dominates the corpus — the model must carve it out as a piece
    // and encode 'ababab' in fewer pieces than characters
    val docs = (Seq.fill(40)("ababab abab") ++ Seq.fill(3)("xyz zyx"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = UnigramLm.train(docs, vocabSize = 20, emIters = 3)
    assert(m.logp.keys.exists(p => p.length > 1 && p.forall("ab".contains(_))),
      s"no multi-char ab-piece learned: ${m.logp.keys.toSeq.sorted}")
    val enc = UnigramLm.encodeWord("ababab", m.logp)
    assert(enc.mkString("") == "ababab")
    assert(enc.length < 6, s"no compression: $enc")
  }

  test("every word round-trips, including unseen characters") {
    import spark.implicits._
    val docs = Seq((1L, "hello world hello")).toDF("doc_id", "text")
    val m = UnigramLm.train(docs, vocabSize = 15, emIters = 2)
    // a word with characters the model never saw still segments (floor)
    val enc = UnigramLm.encodeWord("hexqz", m.logp)
    assert(enc.mkString("") == "hexqz")
    // empty word → empty encoding
    assert(UnigramLm.encodeWord("", m.logp).isEmpty)
  }

  test("hard-EM objective is non-decreasing and training is deterministic") {
    val docs = spark.read.parquet(sf("documents"))
    val m1 = UnigramLm.train(docs, vocabSize = 100, emIters = 3)
    val m2 = UnigramLm.train(docs, vocabSize = 100, emIters = 3)
    assert(m1.logp == m2.logp && m1.losses == m2.losses)
    m1.losses.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-6, s"EM objective fell: $a -> $b")
      case _ =>
    }
    // pruning keeps every single char (segmentability) within the budget
    val chars = m1.logp.keys.filter(_.length == 1)
    assert(m1.logp.size <= 100 && chars.nonEmpty)
  }

  test("applyModel: vocab-sized encode, corpus joins word -> pieces") {
    val docs = spark.read.parquet(sf("documents"))
    val m = UnigramLm.train(docs, vocabSize = 150, emIters = 2)
    val enc = UnigramLm.applyModel(Bpe.words(docs), m)
    val bad = enc.filter(concat_ws("", col("pieces")) =!= col("word")).count()
    assert(bad == 0)
    val t = enc.agg(sum(length(col("word"))), sum(col("n_pieces"))).head()
    assert(t.getLong(1) < t.getLong(0), "no compression on the fixture")
  }
}
