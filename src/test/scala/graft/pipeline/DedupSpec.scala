package graft.pipeline

import graft.SparkSpec

/** Dedup invariants on a corpus with known exact and near duplicates. */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    Seq(
      (1L, base),                       // exact dup of 2
      (2L, base),
      (3L, base + " extraword"),        // near dup of 1/2
      (4L, "totally different content about spark engines and queries quick brown fox"),
      (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor")
    ).toDF("doc_id", "text")
  }

  test("minhashCandidatesCapped: hot buckets star to the anchor, small buckets keep all pairs") {
    import spark.implicits._
    // 40 identical boilerplate docs (one hot bucket per band) + the
    // near-dup trio 1/2/3 from the shared fixture
    val boiler = "the quick brown template renders a footer and a header " * 2
    val fixture = docs.unionByName(
      (100L until 140L).map(i => (i, boiler)).toDF("doc_id", "text"))
    val sets = Dedup.shingleSets(fixture)
    val capped = Dedup.minhashCandidatesCapped(sets, cap = 8).collect()
    val all = Dedup.minhashCandidates(sets).count()
    // star mass: 39 anchor pairs (anchor 100) instead of C(40,2) = 780
    val hot = capped.filter(r => r.getLong(0) >= 100L || r.getLong(1) >= 100L)
    assert(hot.length == 39 && hot.forall(_.getLong(0) == 100L),
      s"expected 39 star pairs anchored at 100, got ${hot.length}")
    assert(all >= 780L + 3,
      s"uncapped generator must carry the C(40,2) bucket mass, got $all")
    // the small-bucket pairs (the 1/2/3 near-dup trio) are untouched
    val organic = capped.filter(r => r.getLong(0) < 100L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(organic),
      s"small buckets must keep all pairs, got $organic")
  }

  test("minhashCandidatesAuto: budget -> cap formula, hot bucket stars iff over budget") {
    import spark.implicits._
    val boiler = "the quick brown template renders a footer and a header " * 2
    val fixture = docs.unionByName(
      (100L until 140L).map(i => (i, boiler)).toDF("doc_id", "text"))
    val sets = Dedup.shingleSets(fixture)
    // budget 100 pairs -> cap = max(32, ceil(sqrt(200))) = 32 < 40: the
    // 40-doc boilerplate bucket is over budget and stars (39 anchor pairs)
    val tight = Dedup.minhashCandidatesAuto(sets, pairBudgetPerBucket = 100L)
      .collect().filter(r => r.getLong(0) >= 100L || r.getLong(1) >= 100L)
    assert(tight.length == 39 && tight.forall(_.getLong(0) == 100L),
      s"over-budget bucket must star, got ${tight.length} pairs")
    // budget 4M (default) -> cap 2897 >> 40: nothing stars, the bucket
    // keeps its full C(40,2) mass (same output as the uncapped generator)
    val loose = Dedup.minhashCandidatesAuto(sets)
      .filter(org.apache.spark.sql.functions.col("aid") >= 100L).count()
    assert(loose == 780L,
      s"under-budget bucket must keep all C(40,2) pairs, got $loose")
    assertThrows[IllegalArgumentException](
      Dedup.minhashCandidatesAuto(sets, pairBudgetPerBucket = 1L))
  }

  test("starAudit: genuine cluster verifies 1.0, a dissimilar anchor is exposed") {
    import spark.implicits._
    val boiler = "the quick brown template renders a footer and a header " * 2
    // genuine cluster: 40 identical docs (ids 100+) -> every hot bucket
    // anchor-verifies fully
    val genuine = Dedup.shingleSets(docs.unionByName(
      (100L until 140L).map(i => (i, boiler)).toDF("doc_id", "text")))
    val g = Dedup.starAudit(genuine, cap = 8).collect()
    assert(g.nonEmpty, "the 40-doc cluster must star at cap 8")
    assert(g.forall(_.getAs[Double]("frac") == 1.0),
      "identical-text buckets must anchor-verify fully")
    // poisoned anchor: doc 99 shares the boilerplate's shingles but adds
    // distinct tokens, and as the LOWEST id it becomes every colliding
    // bucket's anchor — the silent recall-loss case the audit exposes.
    // The extra-token count trades two deterministic monotone effects:
    // more extras lower J(99, member) below the 0.8 threshold, fewer
    // extras keep more band minima unchanged so 99 still collides.
    // Scan the window for the first count that shows BOTH (fixture is
    // fixed — the scan is deterministic, not probabilistic):
    val exposed = (2 to 12).view.map { e =>
      val extra = (1 to e).map(i => s"tok$i").mkString(" ")
      val poisoned = Dedup.shingleSets(docs.unionByName(
        ((100L until 140L).map(i => (i, boiler)) :+ (99L, boiler + extra))
          .toDF("doc_id", "text")))
      val b = Dedup.starAudit(poisoned, cap = 8).collect()
        .filter(_.getAs[Long]("members") == 41L)
      poisoned.unpersist()
      (e, b)
    }.find { case (_, b) =>
      b.nonEmpty && b.forall(_.getAs[Double]("frac") < 1.0)
    }
    assert(exposed.nonEmpty,
      "some extra-token count must put doc 99 in the cluster's buckets " +
        "(41 members) with a sub-threshold anchor — audit must expose it")
  }

  test("exactStats counts duplicates") {
    val r = Dedup.exactStats(docs).collect()(0)
    assert(r.getLong(0) == 5 && r.getLong(1) == 4 && r.getLong(2) == 1)
  }

  test("exactGroups finds the duplicate group with min id as rep") {
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length == 1 && g(0).getLong(0) == 1L && g(0).getLong(1) == 2L)
  }

  test("decontaminateNgram: any shared n-gram contaminates, short docs immune") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta end"),  // shares "beta gamma delta"
      (2L, "totally unrelated text here"),
      (3L, "beta gamma")                   // shorter than n: no grams
    ).toDF("doc_id", "text")
    val bench = Seq((9L, "start beta gamma delta tail")).toDF("doc_id", "text")
    val clean = Dedup.decontaminateNgram(corpus, bench, n = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(clean.toList == List(2L, 3L))
    val flagged = Dedup.contaminatedNgramIds(corpus, bench, n = 3)
      .collect().map(_.getLong(0)).toList
    assert(flagged == List(1L))
    // n = 1 degrades to token-overlap — everything sharing a word goes
    val strict = Dedup.decontaminateNgram(corpus, bench, n = 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(strict.toList == List(2L))
    intercept[IllegalArgumentException](
      Dedup.decontaminateNgram(corpus, bench, n = 0))
  }

  test("minhash LSH recalls exact and near dups, rejects unrelated (precision via verify)") {
    val pairs = Dedup.nearDupPairsMinhash(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup must always collide (recall 1.0)")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), "near dup pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not pair")
  }

  test("simhash and ngram strategies agree with minhash after verification") {
    val m = Dedup.nearDupPairsMinhash(docs, 0.8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s = Dedup.nearDupPairsSimhash(docs, 0.8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = Dedup.nearDupPairsNgram(docs, 0.8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == s && s == n)
  }

  test("simhash band width is the Manku k+1 knob: Hamming < bands pairs always collide") {
    // bands=b guarantees recall for Hamming ≤ b−1 (pigeonhole: one clean
    // block) and NOTHING beyond — measured on the sf0.01 fixture, J ≥ 0.8
    // near-dups reach Hamming 8–15, so bands=8 drops real oracle pairs
    // (the reason q_dedup_simhash stays on the 16×4-bit configuration and
    // its birthday term; minhash-LSH is the at-scale path). Here: exact
    // dups are Hamming 0 and must collide under EVERY legal band split;
    // the wide split's candidate set is a subset of the narrow split's.
    val sets = Dedup.shingleSets(docs)
    val wide = Dedup.simhashCandidates(sets, maxHamming = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = Dedup.simhashCandidates(sets, maxHamming = 15, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.contains((1L, 2L)), "Hamming-0 exact dup must collide at bands=8")
    assert(wide.subsetOf(narrow),
      "wide blocks admit fewer coincidental candidates, never new ones")
    assertThrows[IllegalArgumentException](
      Dedup.simhashCandidates(sets, bands = 10)) // 10 does not divide 64
  }

  test("prefix-filter blocking is EXACT vs brute-force all-pairs Jaccard") {
    // the property the round-4 rewrite claims: every J >= t pair survives
    // blocking (recall 1.0), on randomized corpora engineered to contain
    // true near-dup pairs — not just the fixture
    import spark.implicits._
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- Seq(7, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      val base = (0 until 12).map { i =>
        (0 until (10 + rnd.nextInt(15))).map(_ => vocab(rnd.nextInt(vocab.length)))
      }
      // near-copies: mutate 0-2 words of a base doc (J likely >= 0.8);
      // plus the base docs themselves (self-pairs excluded by aid < bid)
      val docsSeq = base.zipWithIndex.flatMap { case (words, i) =>
        val mutated = words.zipWithIndex.map { case (w, j) =>
          if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.length)) else w
        }
        Seq((i.toLong * 2, words.mkString(" ")), (i.toLong * 2 + 1, mutated.mkString(" ")))
      }
      val docsDf = docsSeq.toDF("doc_id", "text")

      def shingles(text: String): Set[String] = {
        val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        if (toks.length < 3) Set.empty
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val byId = docsSeq.toMap.map { case (id, t) => id -> shingles(t) }
      val ids = byId.keys.toSeq.sorted
      val expect = (for {
        a <- ids; b <- ids if a < b
        sa = byId(a); sb = byId(b)
        if sa.nonEmpty && sb.nonEmpty
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= 0.8
      } yield (a, b)).toSet
      assert(expect.nonEmpty, s"seed $seed generated no true pairs — broken generator")

      val got = Dedup.nearDupPairsNgram(docsDf, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect,
        s"seed $seed: missed=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    }
  }

  test("verifyJaccard filters a candidate below threshold") {
    val sets = Dedup.shingleSets(docs)
    import spark.implicits._
    val fakeCandidates = Seq((1L, 4L), (1L, 2L)).toDF("aid", "bid")
    val out = Dedup.verifyJaccard(fakeCandidates, sets, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L))) // (1,4) is dissimilar → dropped
  }

  test("dedupLines drops cross-doc boilerplate, keeps order, blanks, and empty docs") {
    import spark.implicits._
    val multi = Seq(
      (1L, "cookie banner\nunique one\n\nunique two"),
      (2L, "cookie banner\nother content"),
      (3L, "  cookie banner \nthird thing"),  // trimmed form matches
      (4L, "cookie banner"),                   // nothing survives → empty
      (5L, "solo line never repeated")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(multi, 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique one\n\nunique two") // order + blank preserved
    assert(out(2L) == "other content")
    assert(out(3L) == "third thing")
    assert(out(4L) == "")                         // doc retained, text empty
    assert(out(5L) == "solo line never repeated") // df=1 untouched
  }

  test("dedupLines threshold is >= minDf on DISTINCT docs, not occurrences") {
    import spark.implicits._
    // "twice here" occurs 3 times but in only 2 docs → df=2 < 3 → kept
    val multi = Seq(
      (1L, "twice here\ntwice here\na"),
      (2L, "twice here\nb"),
      (3L, "c")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(multi, 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "twice here\ntwice here\na")
    assert(out(2L) == "twice here\nb")
  }

  test("semDedup: cluster-blocked cosine dedup keeps lowest id per group") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 1.0f, 0f, 0f), 1),
      (2L, Array(0.99f, 0.01f, 0f, 0f), 0), // near-dup of 0, same cell
      (3L, Array(0f, 0.98f, 0.02f, 0f), 1), // near-dup of 1, same cell
      (4L, Array(0f, 0f, 1.0f, 0f), 2),     // orthogonal to everything: kept
      (5L, Array(0.60f, 0.62f, 0f, 0f), 3), // near-dup pair 5/6 lands in
      (6L, Array(0.62f, 0.60f, 0f, 0f), 3)  //   DIFFERENT cells: both kept —
                                            //   the paper's recall trade-off
    ).toDF("vec_id", "embedding", "label")
    val kept = Dedup.semDedup(emb, nlist = 2, threshold = 0.8)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept.keySet == Set(0L, 1L, 4L, 5L, 6L), kept.toString)
    // centers (the two lowest ids) anchor their own cells
    assert(kept(0L) == 1 && kept(1L) == 2, kept.toString)
    assert(kept(5L) != kept(6L), "the blocked pair must straddle cells")
    // plan shape: the verify is an EQUI-join on the cluster key — never a
    // cartesian/BNLJ all-pairs (the SemDeDup scale argument, asserted)
    val plan = Dedup.semDedup(emb, nlist = 2, threshold = 0.8)
      .queryExecution.executedPlan
    val allPairs = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(allPairs.isEmpty, s"all-pairs join in semDedup plan:\n$plan")
  }

  test("semDedup: a zero vector among the lowest ids never seeds a cell") {
    import spark.implicits._
    // vec 0 is degenerate (all-zero): ‖c‖ = 0 would make every score a
    // division by 0.0 — the seed scan must skip it and take the next
    // lowest ids, while the zero vector itself still flows through as
    // data (scores 0 everywhere → cell 1 by first-max tiebreak)
    val emb = Seq(
      (0L, Array(0f, 0f, 0f, 0f), 9),
      (1L, Array(1.0f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 1.0f, 0f, 0f), 1),
      (3L, Array(0.99f, 0.01f, 0f, 0f), 0) // near-dup of 1 → dropped
    ).toDF("vec_id", "embedding", "label")
    val kept = Dedup.semDedup(emb, nlist = 2, threshold = 0.8)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept.keySet == Set(0L, 1L, 2L), kept.toString)
    // cells are seeded by vecs 1 and 2 (the lowest NON-ZERO ids)
    assert(kept(1L) == 1 && kept(2L) == 2, kept.toString)
    assert(kept(0L) == 1, "zero vector lands in cell 1 by first-max tiebreak")
  }

  test("bloom audit: no false negatives, fp monotone in filter pressure") {
    import spark.implicits._
    val corpus = spark.read.parquet(sf("documents"))
    val bench = corpus.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
    def audit(m: Int) =
      Dedup.bloomContaminationAudit(corpus, bench, mBits = m).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val big = audit(1 << 16)
    // exact ⊆ bloom on every row: fp_grams >= 0 and bloom >= exact
    big.foreach { case (id, bl, ex, fp) =>
      assert(fp == bl - ex && fp >= 0, s"doc $id: bloom $bl exact $ex")
    }
    // every benchmark doc flags itself exactly (its own grams are in the set)
    val flagged = big.map(_._1).toSet
    val benchIds = bench.select("doc_id").collect().map(_.getLong(0))
      .filter(id => corpus.filter(org.apache.spark.sql.functions.col("doc_id") === id)
        .select(org.apache.spark.sql.functions.size(
          graft.fts.Analyzer.tokenize(org.apache.spark.sql.functions.col("text"))))
        .collect()(0).getInt(0) >= 13)
    benchIds.foreach(id => assert(flagged.contains(id), s"bench doc $id missed"))
    // shrinking m can only ADD bloom hits (more collisions), never lose one
    val small = audit(1 << 10).map(t => t._1 -> t._2).toMap
    big.foreach { case (id, bl, _, _) =>
      assert(small.getOrElse(id, 0L) >= bl, s"doc $id lost hits at smaller m")
    }
  }

  test("apss: equals brute force, prefix filter actually prunes") {
    import org.apache.spark.sql.functions._
    val corpus = spark.read.parquet(sf("documents"))
    val got = Dedup.cosinePairsApss(corpus, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over all shared-shingle pairs (fine at spec scale)
    val sh = corpus.select(col("doc_id"),
        explode(graft.fts.Analyzer.shingles(
          graft.fts.Analyzer.tokenize(col("text")), 5)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val df = sh.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val n = sh.select("doc_id").distinct().count().toDouble
    val w = sh.join(df, "term")
      .withColumn("w", col("tf") * log(lit(n) / col("df")))
    val nrm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nm"))
    val wn = w.join(nrm, "doc_id")
      .select(col("doc_id"), col("term"), (col("w") / col("nm")).as("wn"))
    val brute = wn.as("a").join(wn.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("aid"), col("b.doc_id").as("bid"))
      .agg(round(sum(col("a.wn") * col("b.wn")), 4).as("cos"))
      .filter(col("cos") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"apss diverged: only-apss=${(got -- brute).take(5)} missed=${(brute -- got).take(5)}")
  }

  test("bloom broadcast-bitset serving path equals the relational audit") {
    import spark.implicits._
    val corpus = spark.read.parquet(sf("documents"))
    val bench = corpus.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
    val relational = Dedup.bloomContaminationAudit(corpus, bench, mBits = 4096)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bits = Dedup.bloomContaminatedIdsBroadcast(corpus, bench, mBits = 4096)
      .collect().map(_.getLong(0)).toSet
    assert(bits == relational,
      s"bitset path diverged: only-bits=${(bits -- relational).take(5)} " +
        s"only-rel=${(relational -- bits).take(5)}")
  }
}
