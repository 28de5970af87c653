package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus-mixing invariants: budget cutoffs, the exclusive-prefix straddle
  * contract, per-source isolation, and determinism of the md5 order. */
class MixingSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  // 4 docs per source, 8 estBpeTokens each (32 chars → ceil(32/4) = 8)
  private lazy val docs = mkDocs(
    (0L until 8L).map { i =>
      (i, if (i < 4) "a" else "b", "x" * 32)
    })

  test("temperature budgets: alpha endpoints and exact integer split") {
    // sources: a = 32 tokens (4 docs × 8), b = 8 tokens (1 doc)
    val skewed = mkDocs(
      (0L until 4L).map(i => (i, "a", "x" * 32)) :+ ((9L, "b", "x" * 32)))
    // alpha = 1: proportional — w4(a) = 320000, w4(b) = 80000
    val prop = Mixing.temperatureBudgets(skewed, 1000L, alpha = 1.0)
    assert(prop == Map("a" -> 800L, "b" -> 200L))
    // alpha = 0: uniform — every source weight 1.0
    val unif = Mixing.temperatureBudgets(skewed, 1000L, alpha = 0.0)
    assert(unif == Map("a" -> 500L, "b" -> 500L))
    // 0 < alpha < 1 flattens: b's share strictly between uniform and
    // proportional
    val temp = Mixing.temperatureBudgets(skewed, 1000L, alpha = 0.3)
    assert(temp("b") > 200L && temp("b") < 500L, temp.toString)
    // budgets never exceed the total and feed the mixer unchanged
    assert(temp.values.sum <= 1000L)
    assert(Mixing.mixByBudget(skewed, temp).count() > 0)
    // zero total → all-zero budgets (selects nothing, loud in data)
    assert(Mixing.temperatureBudgets(skewed, 0L, 0.3).values.forall(_ == 0L))
  }

  test("counted path: real BPE counts drive budgets and selection") {
    import spark.implicits._
    // corpus where BPE counts differ sharply from the /4 estimator:
    // 'aaaa…' compresses to few pieces under merges trained on it
    val bpeDocs = mkDocs(
      (0L until 4L).map(i => (i, "a", "aaaaaaaa " * 4)) ++
        (4L until 8L).map(i => (i, "b", "zq xv jk wp")))
    val merges = Bpe.train(bpeDocs, numMerges = 10)
    val counts = Bpe.countTokens(bpeDocs, merges)
    val got = counts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 'aaaaaaaa' → merges learn aa, aaaa, aaaaaaaa → 1 piece × 4 words;
    // the 2-char b-side words can halve at best
    assert(got(0L) == 4L, s"a-side real count ${got(0L)}")
    assert(got(4L) <= 8L && got(4L) >= 4L, s"b-side real count ${got(4L)}")
    val perDoc = bpeDocs.select(col("doc_id"), col("source"))
      .join(counts, "doc_id")
    val budgets = Mixing.temperatureBudgetsCounted(perDoc, 100L, alpha = 1.0)
    // proportional split over the REAL totals (a = 16, b = 4·got(4))
    val aTot = 16.0; val bTot = 4.0 * got(4L)
    assert(budgets("a") == (BigInt(100) * math.round(aTot * 10000) /
      (math.round(aTot * 10000) + math.round(bTot * 10000))).toLong,
      budgets.toString)
    // selection spends the same units: budget exactly a's total → all of
    // a (prefix covers the whole source), none beyond
    val sel = Mixing.mixByBudgetCounted(perDoc, Map("a" -> 16L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(sel.length == 4 && sel.forall(_._2 == 4L), sel.toSeq.toString)
    // token-free docs surface as 0-count rows, not dropped
    val withEmpty = mkDocs(Seq((0L, "a", "hello world"), (1L, "a", "...")))
    val c2 = Bpe.countTokens(withEmpty, Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2(1L) == 0L && c2(0L) == 10L, c2.toString)
  }

  test("repeat caps: waterfill caps the binding prefix, redistributes exactly") {
    // a = 32 tokens, b = 8 tokens; alpha 0 → equal weights. total 30:
    // uncapped split is 15/15, but 1 epoch caps b at 8 — the freed 7
    // flow to a: floor((30−8)·w/w) = 22.
    val skewed = mkDocs(
      (0L until 4L).map(i => (i, "a", "x" * 32)) :+ ((9L, "b", "x" * 32)))
    val got = Mixing.temperatureBudgetsCapped(skewed, 30L, alpha = 0.0,
      maxEpochs = 1.0)
    assert(got == Map("a" -> 22L, "b" -> 8L), got.toString)
    // every source capped → the mixture under-fills at Σ caps
    val all = Mixing.temperatureBudgetsCapped(skewed, 1000L, alpha = 0.0,
      maxEpochs = 2.0)
    assert(all == Map("a" -> 64L, "b" -> 16L), all.toString)
    // demand fits under every cap → identical to the uncapped budgets
    val free = Mixing.temperatureBudgetsCapped(skewed, 20L, alpha = 0.0,
      maxEpochs = 5.0)
    assert(free == Mixing.temperatureBudgets(skewed, 20L, alpha = 0.0),
      free.toString)
  }

  test("waterfill sort is EXACT at quantization-collision magnitudes") {
    import spark.implicits._
    // two sources whose true cap/weight ratios differ by ~1e-13 — BELOW
    // the r12 sort key's ⌊cap·10¹²/w⌋ resolution, so the quantized key
    // ties and the name tiebreak would order "a" (the HIGHER ratio, n =
    // 10101) before "b" (n = 10099): the prefix loop then probes a first,
    // fails, stops early, and the allocation diverges from the waterfill
    // (z 449985148 instead of 449985149, b never examined for capping).
    // The exact cross-multiplied comparator orders b first regardless of
    // name. alpha = 1 → w = n·10⁴; maxEpochs = 1.5 → cap = ⌊1.5n⌋.
    val perDoc = Seq(("a", 10101L), ("b", 10099L), ("z", 300000000L))
      .toDF("source", "toks")
    val got = Mixing.temperatureBudgetsCappedCounted(perDoc,
      totalBudget = 450015448L, alpha = 1.0, maxEpochs = 1.5)
    val caps = Map("a" -> 15151L, "b" -> 15148L, "z" -> 450000000L)
    got.foreach { case (s, bud) =>
      assert(bud <= caps(s), s"source $s exceeds its cap: $bud > ${caps(s)}")
    }
    // the exact waterfill: b caps (lowest true ratio, binding), a and z
    // split the remainder proportionally
    assert(got == Map("b" -> 15148L, "a" -> 15150L, "z" -> 449985149L),
      got.toString)
  }

  test("budget caps each source independently; zero budget drops the source") {
    val out = Mixing.mixByBudget(docs, Map("a" -> 16L, "b" -> 0L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // 16-token budget over 8-token docs → exactly 2 docs of source a
    assert(out.length == 2 && out.forall(_._2 == "a") && out.forall(_._3 == 8L))
  }

  test("a straddling doc is kept (exclusive prefix: start < budget)") {
    val out = Mixing.mixByBudget(docs, Map("a" -> 9L))
      .collect()
    // first doc starts at 0 (< 9), second at 8 (< 9, straddles), third at 16
    assert(out.length == 2)
  }

  test("unlisted sources are dropped; uncapped budget keeps a source whole") {
    val out = Mixing.mixByBudget(docs, Map("b" -> 1000L)).collect()
    assert(out.length == 4 && out.forall(_.getString(1) == "b"))
  }

  test("selection is the md5-ordered prefix and is partition-count invariant") {
    val expected = docs.filter(col("source") === "a")
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 8).as("h"))
      .orderBy("h", "doc_id").limit(2)
      .collect().map(_.getLong(0)).toSet
    val got = Mixing.mixByBudget(docs, Map("a" -> 16L))
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val got3 = Mixing.mixByBudget(docs, Map("a" -> 16L))
        .collect().map(_.getLong(0)).toSet
      assert(got3 == expected, "partitioning must not change the selection")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("per-source cumsum resets inside a shared range partition") {
    // one partition forces both sources through the same linear pass
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val out = Mixing.mixByBudget(docs, Map("a" -> 16L, "b" -> 16L))
        .collect().map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
      assert(out == Map("a" -> 2, "b" -> 2),
        s"source b's cumsum must restart at 0: $out")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
