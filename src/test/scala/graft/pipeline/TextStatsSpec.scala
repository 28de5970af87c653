package graft.pipeline

import graft.SparkSpec

/** PII-redaction invariants (the rest of TextStats is pinned per-doc by
  * the q_text_* oracle hashes). */
class TextStatsSpec extends SparkSpec {

  private def redact(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextStats.redactPii(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  test("a token-free doc yields NULL ratios + 'unk' lang, not an ANSI crash") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val empty = Seq((7L, "!!! ???")).toDF("doc_id", "text")
    val r = TextStats.qualityStats(empty).collect()(0)
    assert(r.getInt(r.fieldIndex("n_tokens")) == 0)
    assert(r.isNullAt(r.fieldIndex("distinct_ratio")),
      "ANSI-mode /0 must be guarded to NULL, never thrown")
    assert(r.isNullAt(r.fieldIndex("mean_tok_len")))
    assert(empty.select(TextStats.langGuess(col("text"))).collect()(0)
      .getString(0) == "unk")
  }

  test("rakeKeywords: deg/freq word scores and phrase sums by hand") {
    import spark.implicits._
    // One doc, stopwords split it into three candidate runs:
    //   "fast query" (len 2), "fast scan" (len 2), "query" (len 1)
    val docs = Seq((1L, "the fast query of a fast scan is the query"))
      .toDF("doc_id", "text")
    // freq(fast)=2 deg(fast)=4 → 2.0; freq(query)=2 deg(query)=3 → 1.5;
    // freq(scan)=1 deg(scan)=2 → 2.0
    // scores: "fast query" 3.5, "fast scan" 4.0, "query" 1.5
    val r = TextStats.rakeKeywords(docs, perDoc = 3)
      .collect().map(x => (x.getString(1), x.getDouble(2))).toList
    assert(r == List(("fast scan", 4.0), ("fast query", 3.5), ("query", 1.5)),
      r.toString)
    // perDoc bounds the list; all-stopword docs yield no phrases
    assert(TextStats.rakeKeywords(docs, perDoc = 1)
      .collect().map(_.getString(1)).toList == List("fast scan"))
    val stopOnly = Seq((2L, "the of a to and")).toDF("doc_id", "text")
    assert(TextStats.rakeKeywords(stopOnly).count() == 0)
    // duplicate phrase occurrences dedupe in the output but still count
    // in the statistics: "big win" twice → freq(big)=2, deg(big)=4
    val dup = Seq((3L, "big win the big win")).toDF("doc_id", "text")
    val d = TextStats.rakeKeywords(dup)
      .collect().map(x => (x.getString(1), x.getDouble(2))).toList
    assert(d == List(("big win", 4.0)), d.toString)
  }

  test("redactPii scrubs emails, ips, and phones and audits counts on raw text") {
    val out = redact(Seq(
      (1L, "write to alice.smith+x@mail.example.org today"),
      (2L, "host 192.168.1.254 and 10.0.0.1 are up"),
      (3L, "call 555-123-4567 or 555-000-9999"),
      (4L, "mixed bob@x.io at 8.8.8.8 dial 555-111-2222"),
      (5L, "nothing sensitive here")))
    assert(out(1L) == ("write to <EMAIL> today", 1L, 0L, 0L))
    assert(out(2L) == ("host <IP> and <IP> are up", 0L, 2L, 0L))
    assert(out(3L) == ("call <PHONE> or <PHONE>", 0L, 0L, 2L))
    assert(out(4L) == ("mixed <EMAIL> at <IP> dial <PHONE>", 1L, 1L, 1L))
    assert(out(5L) == ("nothing sensitive here", 0L, 0L, 0L))
  }

  test("redactPii leaves near-misses alone") {
    val out = redact(Seq(
      (1L, "not an email: user at example dot com"),
      (2L, "version 1.2.3 is not an ip"),
      (3L, "ticket 555-12-3456 is not a phone")))
    assert(out(1L)._1.contains("user at example dot com") && out(1L)._2 == 0L)
    assert(out(2L)._1.contains("1.2.3") && out(2L)._3 == 0L)
    assert(out(3L)._1.contains("555-12-3456") && out(3L)._4 == 0L)
  }
}
