package graft.pipeline

import graft.SparkSpec

/** Gopher rule-set and C4 cleaning invariants on handcrafted documents
  * that pin each rule's threshold direction. */
class CurationSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // 60 words, mean length 4, no symbols/bullets/ellipses, 3 stop kinds
  private val goodText =
    (Seq.fill(57)("word") ++ Seq("the", "of", "with")).mkString(" ")

  test("gopherQuality: the clean doc passes, each rule fails one mutant") {
    val docs = mk(Seq(
      1L -> goodText,                                   // keep
      2L -> "too short doc",                            // R1: n_words < 50
      3L -> (Seq.fill(58)("a") ++ Seq("the", "of")).mkString(" "), // R2: mean < 3
      4L -> (goodText + " " + Seq.fill(9)("#").mkString(" ")),     // R3: symbols
      5L -> ((1 to 12).map(i => "- " + goodText).mkString("\n")),  // R4: bullets
      6L -> ((1 to 10).map(_ => goodText + "...").mkString("\n")), // R5: ellipses
      7L -> (Seq.fill(58)("123") ++ Seq("the", "of")).mkString(" "), // R6+R2
      8L -> Seq.fill(60)("word").mkString(" ")))        // R7: 0 stop kinds
    val out = Curation.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false, 7L -> false, 8L -> false), out.toString)
    // signal values are the artifact: spot-pin the clean doc's stats
    val r1 = Curation.gopherQuality(docs).filter("doc_id = 1").collect()(0)
    assert(r1.getLong(r1.fieldIndex("n_words")) == 60L)
    assert(r1.getDouble(r1.fieldIndex("mean_word_len")) == 3.95)
    assert(r1.getLong(r1.fieldIndex("n_stop_kinds")) == 3L)
  }

  test("gopherQuality: a zero-word doc gets NULL ratios and keep = false") {
    val r = Curation.gopherQuality(mk(Seq(9L -> ""))).collect()(0)
    assert(r.getLong(r.fieldIndex("n_words")) == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_word_len")),
      "div-by-zero must surface as NULL (both engines agree), not NaN/inf")
    assert(!r.getBoolean(r.fieldIndex("keep")))
  }

  test("spanCorrupt: sentinels replace spans, targets reconstruct, deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "x y")).toDF("doc_id", "text")
    // rate ~1.0-ε masks every group → every span becomes a sentinel
    val all = Curation.spanCorrupt(docs, span = 3, rate = 0.9999)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(3))).toMap
    assert(all(1L)._1 == "<extra_id_0> <extra_id_1> <extra_id_2>")
    assert(all(1L)._2 == "<extra_id_0> a b c <extra_id_1> d e f <extra_id_2> g h i")
    assert(all(1L)._3 == 3)
    // short tail span keeps only its available tokens
    assert(all(2L)._2 == "<extra_id_0> x y")
    // near-zero rate masks nothing: corrupted == original token stream
    val none = Curation.spanCorrupt(docs, span = 3, rate = 1e-9)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(3))).toMap
    assert(none(1L) == ("a b c d e f g h i", 0))
    // deterministic: two runs produce identical pairs at a real rate
    def run() = Curation.spanCorrupt(docs, rate = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(run() == run())
    // corrupted + targets jointly cover every original token exactly once
    val mid = Curation.spanCorrupt(docs, rate = 0.5).collect()
      .map(r => r.getString(1) + " " + r.getString(2)).mkString(" ")
    val toks = mid.split("\\s+").filterNot(_.startsWith("<extra_id_"))
    assert(toks.sorted.mkString(" ") == "a b c d e f g h i x y")
    intercept[IllegalArgumentException](Curation.spanCorrupt(docs, rate = 1.5))
    intercept[IllegalArgumentException](Curation.spanCorrupt(docs, span = 0))
  }

  test("c4Clean: line retention rules and page-level drops") {
    val docs = mk(Seq(
      // 3 good lines -> kept page; bad lines removed from clean_text
      1L -> ("one two three four five six.\n" +
        "seven eight nine ten eleven twelve!\n" +
        "no terminal punctuation here at all\n" +
        "short line.\n" +
        "js one two three javascript four five.\n" +
        "thirteen fourteen fifteen sixteen seventeen?"),
      // only 2 surviving lines -> page dropped
      2L -> "one two three four five six.\nseven eight nine ten eleven.",
      // lorem ipsum anywhere -> page dropped even with 3 good lines
      3L -> ("one two three four five six.\n" +
        "seven eight nine ten eleven twelve.\n" +
        "lorem ipsum words one two three four.\n" +
        "thirteen fourteen fifteen sixteen seventeen."),
      // '{' anywhere -> page dropped
      4L -> ("one two three four five six.\n" +
        "seven eight nine ten eleven twelve.\n" +
        "code sample { one two three four.\n" +
        "thirteen fourteen fifteen sixteen seventeen.")))
    val out = Curation.c4Clean(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._3 && out(1L)._2 == 3L, out(1L).toString)
    assert(out(1L)._1 ==
      "one two three four five six.\n" +
        "seven eight nine ten eleven twelve!\n" +
        "thirteen fourteen fifteen sixteen seventeen?")
    assert(!out(2L)._3 && out(2L)._2 == 2L)
    // the lorem/{ lines themselves end in '.', >= 5 words, no javascript:
    // they SURVIVE line filtering (4 kept lines) — the PAGE rule kills
    assert(!out(3L)._3 && out(3L)._2 == 4L)
    assert(!out(4L)._3 && out(4L)._2 == 4L)
  }
}
