package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed contracts for the LM curation signals (the per-doc values
  * at fixture scale are pinned by the q_text_perplexity / q_text_dsir /
  * q_text_chunk oracle hashes; these tests pin the FORMULAS on inputs
  * small enough to verify by hand). */
class LmSpec extends SparkSpec {

  import Lm._

  test("perplexity matches the add-alpha unigram formula by hand") {
    import spark.implicits._
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c")).toDF("doc_id", "text")
    // counts: a=2 b=1, N=3, V=2; p(t) = (c+0.5)/(3 + 0.5*3)
    val pa = 2.5 / 4.5; val pb = 1.5 / 4.5; val pu = 0.5 / 4.5
    val expected = math.exp(-(math.log(pa) + math.log(pb) + math.log(pu)) / 3)
    val got = perplexity(docs, train).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 10L)
    assert(math.abs(got(0).getDouble(1) - expected) < 5e-5) // rounded to 4dp
  }

  test("perplexity ranks reference-like text below garbage") {
    import spark.implicits._
    val train = (1L to 20L).map(i => (i, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "the quick brown fox"), (2L, "zzz qqq www xxx"))
      .toDF("doc_id", "text")
    val m = perplexity(docs, train).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) < m(2L))
  }

  test("perplexity emits no row for token-free docs") {
    import spark.implicits._
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a"), (2L, "!!! ???")).toDF("doc_id", "text")
    assert(perplexity(docs, train).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("knPerplexity: Kneser-Ney interpolation, backoff, and floor by hand") {
    import spark.implicits._
    // train "a b a c": cvw all 1; c(a)=2, N1+(a·)=2; N1+(·b)=N1+(·a)=N1+(·c)=1;
    // N1+(··)=3 → Pcont = 1/3 each
    val train = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"), // seen: p = (1−.75 + .75·2·(1/3))/2 = 0.375 → ppl 8/3
      (2L, "a z"), // unseen continuation z: p = 0 → floor 1/4 → ppl 4
      (3L, "z a"), // unseen context z: backoff Pcont(a) = 1/3 → ppl 3
      (4L, "x")    // one token: no bigram stream, no row
    ).toDF("doc_id", "text")
    val r = Lm.knPerplexity(docs, train)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 2.6667, 2L -> 4.0, 3L -> 3.0), r.toString)
    // sanity: train-like text scores lower perplexity than shuffled junk
    val big = Seq((0L, "the quick fox jumps over the lazy dog " * 5))
      .toDF("doc_id", "text")
    val probe = Seq((1L, "the quick fox jumps"), (2L, "dog the over quick"))
      .toDF("doc_id", "text")
    val p = Lm.knPerplexity(probe, big)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(p(1L) < p(2L), p.toString)
    intercept[IllegalArgumentException](Lm.knPerplexity(docs, train, discount = 1.5))
    // a bigram-free train corpus must degrade to the uniform floor
    // (ppl = N1pp+1 = 1), not ANSI-crash the stage on 0/0
    val emptyTrain = Seq((0L, "solo")).toDF("doc_id", "text")
    val deg = Lm.knPerplexity(docs, emptyTrain)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(deg.values.forall(_ == 1.0), deg.toString)
  }

  test("ccnetBuckets: per-language tertiles, boundary docs bucket downward") {
    import spark.implicits._
    // language A: six docs whose ppl strictly orders by junk fraction;
    // language B: three docs — per-language tertiles must split A 2/2/2
    // and B 1/1/1 regardless of B's absolute ppl range
    val train = Seq((100L, "good words flow nicely here " * 4)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "A", "good words flow nicely here good words"),
      (2L, "A", "good words flow junk1 here"),
      (3L, "A", "good junk1 junk2 nicely"),
      (4L, "A", "junk1 junk2 junk3 flow"),
      (5L, "A", "junk1 junk2 junk3 junk4"),
      (6L, "A", "good words flow nicely"),
      (7L, "B", "good words flow nicely here"),
      (8L, "B", "good junk1 flow"),
      (9L, "B", "junk1 junk2 junk3")
    ).toDF("doc_id", "lang", "text")
    val r = Lm.ccnetBuckets(docs, train)
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getString(3))).toMap
    val aBuckets = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(r(_)._2)
    assert(aBuckets.count(_ == "head") == 2 &&
      aBuckets.count(_ == "middle") == 2 && aBuckets.count(_ == "tail") == 2,
      r.toString)
    // B's cleanest doc is head IN B even though A has lower-ppl docs
    assert(r(7L)._2 == "head" && r(9L)._2 == "tail")
    // most-junk docs land in tail
    assert(r(5L)._2 == "tail" && r(1L)._2 == "head")
  }

  test("bigramBuckets: md5-prefix buckets per adjacent pair; empty under 2 tokens") {
    import spark.implicits._
    val out = Seq((1L, "a b c"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), bigramBuckets(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def h(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(3)
    assert(out(1L) == Seq(h("a b"), h("b c")))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("dsirWeights separates target-like from raw-like docs") {
    import spark.implicits._
    // target slice speaks "good data"; raw background speaks "spam junk";
    // two probes, one in each dialect — weights must split in sign.
    val docs = ((1L to 10L).map(i => (i, "good data good data", true)) ++
      (11L to 30L).map(i => (i, "spam junk spam junk", false)) ++
      Seq((100L, "good data", false), (101L, "spam junk", false)))
      .toDF("doc_id", "text", "tgt")
    val w = dsirWeights(docs, col("tgt")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(100L) > 0, s"target-like probe got ${w(100L)}")
    assert(w(101L) < 0, s"raw-like probe got ${w(101L)}")
    assert(w(100L) > w(101L))
  }

  test("chunk emits exact overlapping windows with a kept partial tail") {
    import spark.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "")).toDF("doc_id", "text")
    val rows = chunk(docs, chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 4L, "t6 t7 t8 t9"),
      (1L, 3L, 1L, "t9")))
    intercept[IllegalArgumentException](chunk(docs, chunkTokens = 2, stride = 3))
  }
}
