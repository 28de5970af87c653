package graft.fts

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** FTS semantics on a tiny hand-computable corpus. */
class SearchSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "spark makes big data simple"),
      (2L, "big data big results"),
      (3L, "spark streaming of data streams"),
      (4L, "nothing to see here")
    ).toDF("doc_id", "text")
  }
  private lazy val ix = Index.build(docs)

  test("postings: tf and df are exact") {
    val p = ix.postings.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(p.contains(("big", 2L, 2L)))   // "big" twice in doc 2
    assert(p.contains(("spark", 1L, 1L)))
    assert(ix.docLens.filter(col("doc_id") === 2).collect()(0).getLong(1) == 4L)
    val s = ix.stats.collect()(0)
    assert(s.getLong(0) == 4L) // n_docs
  }

  test("matchAll = AND, matchAny = OR") {
    assert(Search.matchAllIds(ix, Seq("spark", "data")).collect().map(_.getLong(0)).sorted
      === Array(1L, 3L))
    assert(Search.matchAnyIds(ix, Seq("spark", "results")).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
  }

  test("matchBoolean honors mustNot") {
    val r = Search.matchBoolean(docs, ix, must = Seq("data"), mustNot = Seq("streaming"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(r === Array(1L, 2L))
  }

  test("phrase match requires adjacency in order") {
    val r = Search.matchPhrase(docs, ix, Seq("big", "data"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(r === Array(1L, 2L)) // doc 3 has data but not "big data"
    val r2 = Search.matchPhrase(docs, ix, Seq("data", "big"))
      .select("doc_id").collect().map(_.getLong(0))
    assert(r2 === Array(2L)) // "big DATA BIG results" — reversed phrase hits only doc 2
    val r3 = Search.matchPhrase(docs, ix, Seq("simple", "spark"))
      .select("doc_id").collect().map(_.getLong(0))
    assert(r3.isEmpty) // both terms in doc 1 but never adjacent in this order
  }

  test("wildcard-slot phrase: pattern slots union their matching terms") {
    val pix = Index.buildPositional(docs)
    def wild(slots: Seq[String]): Array[Long] =
      Search.matchPhraseWildPositional(pix, slots)
        .collect().map(_.getLong(0)).sorted
    // "big data" with a starred second slot: d* matches data in docs 1,2
    assert(wild(Seq("big", "d*")) === Array(1L, 2L))
    // pattern in first position: s* data → "...big data" no; "spark
    // streaming of data" has no s*-term ADJACENT to data
    assert(wild(Seq("s*", "data")).isEmpty)
    // ? is exactly one char: b?g data = big data
    assert(wild(Seq("b?g", "data")) === Array(1L, 2L))
    assert(wild(Seq("b??g", "data")).isEmpty)
    // a pattern matching SEVERAL terms unions their positions: doc 3
    // "spark streaming of data streams" — s* adjacent to 'of' is
    // 'streaming' (pos 2); 'of' is pos 3
    assert(wild(Seq("s*", "of")) === Array(3L))
    assert(wild(Seq("of", "d*", "s*")) === Array(3L)) // of data streams
    // exact-only slots degrade to the exact positional phrase
    assert(wild(Seq("big", "data")) ===
      Search.matchPhrasePositional(pix, Seq("big", "data"))
        .collect().map(_.getLong(0)).sorted)
  }

  test("sloppy phrase: ordered chain within the slop window") {
    val pix = Index.buildPositional(docs)
    def slop(phrase: Seq[String], k: Int): Array[Long] =
      Search.matchPhraseSloppy(pix, phrase, k)
        .collect().map(_.getLong(0)).sorted
    // slop 0 = exact phrase (matches matchPhrasePositional)
    assert(slop(Seq("big", "data"), 0) === Array(1L, 2L))
    assert(slop(Seq("spark", "data"), 0) sameElements Array.empty[Long])
    // doc 1 "spark makes big data simple": spark..data span 3 → needs slop ≥ 2
    // doc 3 "spark streaming of data streams": span 3 likewise
    assert(slop(Seq("spark", "data"), 1) sameElements Array.empty[Long])
    assert(slop(Seq("spark", "data"), 2) === Array(1L, 3L))
    // ORDER matters: data..spark never occurs (vs unordered NEAR which
    // would match both docs at slop 3)
    assert(slop(Seq("data", "spark"), 5) sameElements Array.empty[Long])
    // 3-term chain: spark..big..data in doc 1, span 3, gaps 1 → slop 1
    assert(slop(Seq("spark", "big", "data"), 0) sameElements Array.empty[Long])
    assert(slop(Seq("spark", "big", "data"), 1) === Array(1L))
    // repeated term: "big data big" in doc 2 "big data big results", exact
    assert(slop(Seq("big", "data", "big"), 0) === Array(2L))
    // single term degenerates to containment
    assert(slop(Seq("spark"), 2) === Array(1L, 3L))
  }

  test("sloppy phrase kernel agrees with the positional plan") {
    import org.apache.spark.unsafe.types.UTF8String
    def kern(text: String, terms: Seq[String], k: Int): Boolean =
      graft.ext.FtsPhraseSlopTokens.eval(UTF8String.fromString(text),
        terms.map(UTF8String.fromString).toArray, k)
    val corpus = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val pix = Index.buildPositional(docs)
    for (phrase <- Seq(Seq("big", "data"), Seq("spark", "data"),
           Seq("spark", "big", "data"), Seq("big", "data", "big"),
           Seq("data", "spark"));
         k <- 0 to 3) {
      val planIds = Search.matchPhraseSloppy(pix, phrase, k)
        .collect().map(_.getLong(0)).toSet
      val kernIds = corpus.collect {
        case (id, t) if kern(t, phrase, k) => id
      }.toSet
      assert(planIds == kernIds,
        s"phrase=$phrase slop=$k: plan=$planIds kernel=$kernIds")
    }
    // a LATER completion with a LATER start must still match: the first
    // b..d pair overshoots the window, the second fits
    assert(kern("b x x x d b d", Seq("b", "d"), 1))
    assert(!kern("b x x x d", Seq("b", "d"), 1))
  }

  test("synonyms: absent term matches through its group; blended stats rank") {
    // 'rapid' is not in the corpus — it must match only via synonym 'big'
    val ids = Search.matchSynonymIds(ix, Seq("rapid", "data"),
        Map("rapid" -> Seq("big")))
      .collect().map(_.getLong(0)).sorted
    assert(ids === Array(1L, 2L)) // docs with big AND data
    // empty synonym map degenerates to matchAll
    assert(Search.matchSynonymIds(ix, Seq("spark", "data"), Map.empty)
      .collect().map(_.getLong(0)).sorted ===
      Search.matchAllIds(ix, Seq("spark", "data"))
        .collect().map(_.getLong(0)).sorted)
    // blended: group {spark, streams} has df = docs with either = {1, 3};
    // doc 3 has tf 1+1=2 for the group — higher group tf than doc 1's 1
    val scored = Search.scoreSynonymsBm25(ix, Seq("spark"),
        Map("spark" -> Seq("streams")), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(scored.map(_._1).toSet == Set(1L, 3L))
    val byId = scored.toMap
    assert(byId(3L) > byId(1L), s"summed group tf must outrank: $byId")
  }

  test("more-like-this excludes the source doc and ranks by shared rare terms") {
    // doc 2 "big data big results": its rarest weighted terms are big
    // (tf 2) and results; MLT must surface doc 1 (shares big+data) above
    // doc 3 (shares only data), and never return doc 2 itself
    val r = Search.moreLikeThis(ix, docId = 2L, k = 10, nTerms = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(!r.map(_._1).contains(2L), "source doc must be excluded")
    assert(r.nonEmpty && r.head._1 == 1L,
      s"doc 1 shares big+data and must rank first: ${r.toSeq}")
    // unknown doc id → empty result, not an error
    assert(Search.moreLikeThis(ix, docId = 99L, k = 10).collect().isEmpty)
  }

  test("bm25 scores match the closed-form formula") {
    // corpus: N=4, avgdl=(5+4+5+4)/4=4.5 ; query "spark": df=2, tf=1 in docs 1,3
    val res = Search.bm25TopK(docs, Seq("spark"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val idf = math.log((4.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 4.5)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res.keySet == Set(1L, 3L))
    assert(math.abs(res(1L) - s(1, 5)) < 1e-9)
    assert(math.abs(res(3L) - s(1, 5)) < 1e-9)
  }

  test("df cap: stopword band is exact, persisted, and ignored at query time") {
    // 'data' appears in 3/4 docs (df .75), 'big' in 2/4; cap at 0.6 stops
    // exactly the terms with df > 2.4 — only 'data'
    val (capped, stop) = Index.buildWithDfCap(docs, maxDfFrac = 0.6)
    assert(stop.collect().map(_.getString(0)).toSet == Set("data"))
    assert(capped.postings.filter(col("term") === "data").isEmpty,
      "capped term must leave the postings entirely")
    // bounded by construction: every surviving term's df <= cap
    val maxDf = capped.postings.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
      .agg(max(col("df"))).collect()(0).getLong(0)
    assert(maxDf <= 2L)
    // doc lengths follow the surviving postings (doc 2 "big data big
    // results" loses its one 'data' token: dl 4 -> 3)
    assert(capped.docLens.filter(col("doc_id") === 2).collect()(0).getLong(1) == 3L)
    // query-side: capped terms are IGNORED, not required
    val eff = Search.effectiveTerms(Seq("data", "big"), stop)
    assert(eff == Seq("big"))
    assert(Search.matchAllIds(capped, eff).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L))
    // the band travels with the persisted index
    val dir = "/root/repo/target/ttmp/fts_capped_spec"
    Index.writeCapped(capped, stop, dir)
    assert(Index.readStopTerms(spark, dir).collect().map(_.getString(0)).toSet
      == Set("data"))
  }

  test("wildcard: head range + suffix + overlap guard; leading star works") {
    import spark.implicits._
    val wdocs = Seq(
      (1L, "query quarry"), (2L, "quay"), (3L, "qy cert"),
      (4L, "query only here")).toDF("doc_id", "text")
    val wix = Index.build(wdocs)
    def ids(p: String): Set[Long] =
      Search.matchWildcardIds(wix, p).collect().map(_.getLong(0)).toSet
    // 'qy' (len 2) fails the qu*y length guard AND the 'qu' head
    assert(ids("qu*y") == Set(1L, 2L, 4L))   // query, quarry, quay
    // head 'q' + tail 'y' need len >= 2: qy now matches too
    assert(ids("q*y") == Set(1L, 2L, 3L, 4L))
    // leading star: suffix-only over the term dictionary
    assert(ids("*ert") == Set(3L))           // cert
    assert(ids("quer*") == Set(1L, 4L))      // prefix special case
    // overlap guard: 'qu*uay' must NOT match 'quay' (head+tail len 6 > 4)
    assert(ids("qu*uay") == Set.empty[Long])
    intercept[IllegalArgumentException](Search.matchWildcardIds(wix, "a*b*c"))
    intercept[IllegalArgumentException](Search.matchWildcardIds(wix, "*"))
    // reversed layout answers the same leading-star query as a prefix range
    val revDir = "/root/repo/target/ttmp/fts_rev_spec"
    Index.writeReversed(wix, revDir)
    val viaRev = Search.matchSuffixIds(Index.readReversed(spark, revDir), "ert")
      .collect().map(_.getLong(0)).toSet
    assert(viaRev == ids("*ert"))
  }

  test("regex: full-term match, prefix push, dictionary fallback") {
    import spark.implicits._
    val rdocs = Seq(
      (1L, "query quarry"), (2L, "quay"), (3L, "qy cert"),
      (4L, "query only here")).toDF("doc_id", "text")
    val rix = Index.build(rdocs)
    def ids(p: String): Set[Long] =
      Search.matchRegexpIds(rix, p).collect().map(_.getLong(0)).toSet
    // full-term anchoring: 'quar.*' must not match 'query'
    assert(ids("quar.*") == Set(1L))          // quarry
    assert(ids("qu[a-z]+y") == Set(1L, 2L, 4L)) // query quarry quay; qy has
                                                // no [a-z]+ run between u and y
    assert(ids("q.*y") == Set(1L, 2L, 3L, 4L)) // query quarry quay qy
    // prefix-free pattern: dictionary scan, same answer shape
    assert(ids(".*ert") == Set(3L))           // cert
    assert(ids("(query|cert)") == Set(1L, 3L, 4L))
    intercept[IllegalArgumentException](Search.matchRegexpIds(rix, "ab["))
    intercept[IllegalArgumentException](Search.matchRegexpIds(rix, ""))
    // the pushable literal prefix: quantifiers drop their target char,
    // alternation anywhere kills the push (top-level can't be ruled out)
    assert(Search.regexLiteralPrefix("quer[a-z]+") == "quer")
    assert(Search.regexLiteralPrefix("spark?x") == "spar")
    assert(Search.regexLiteralPrefix("spark+x") == "spark")
    assert(Search.regexLiteralPrefix("ab{2}c") == "a")
    assert(Search.regexLiteralPrefix("abc|xyz") == "")
    assert(Search.regexLiteralPrefix(".*ert") == "")
    assert(Search.regexLiteralPrefix("plain") == "plain")
  }

  test("fuzzy match expands over the dictionary within the edit budget") {
    // 'spak' is one deletion from 'spark' → docs 1 and 3; nothing else
    // in the vocabulary is within one edit
    val ids = Search.matchFuzzyIds(ix, "spak").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    // zero-edit degenerates to exact match
    assert(Search.matchFuzzyIds(ix, "big", maxEdits = 0)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // two edits reach further ('dat' → 'data'; 'dta' needs 2)
    assert(Search.matchFuzzyIds(ix, "dta", maxEdits = 1).collect().isEmpty ||
      !Search.matchFuzzyIds(ix, "dta", maxEdits = 1)
        .collect().map(_.getLong(0)).toSet.contains(4L))
    assert(Search.matchFuzzyIds(ix, "dta", maxEdits = 2)
      .collect().map(_.getLong(0)).toSet.contains(1L))
  }

  test("compound: analyzer-first, synonyms post-stem, fuzzy on analyzed dict") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the query planner uses scan primitives"),
      (2L, "queries against the scan layer"), // 'queries' indexes as 'query'
      (3L, "query without the other group"),
      (4L, "scan only here")
    ).toDF("doc_id", "text")
    val cfg = AnalyzerConfig(stopWords = Seq("the"), sStem = true, minTokenLen = 2)
    val aix = Index.buildWithAnalyzer(corpus, cfg)

    def run(terms: Seq[String], syn: Map[String, Seq[String]]): Set[Long] =
      Search.matchCompoundIds(aix, cfg, terms, syn)
        .collect().map(_.getLong(0)).toSet

    // the full composition: 'the' stopped (no empty MUST group);
    // 'querries~1' → stem 'querry' → 1-edit 'query' (incl. doc 2, whose
    // raw 'queries' only exists in the dictionary AS its stem); 'lookup'
    // hits via the analyzed map key 'lookups'→'lookup', member
    // 'scans'→'scan'
    assert(run(Seq("the", "querries~1", "lookup"),
      Map("lookups" -> Seq("scans"))) == Set(1L, 2L))

    // fuzzy pre-stem would be empty: raw 'querries' is 3 edits from
    // 'query'; the non-empty result above proves post-stem expansion.
    // Directly: the expansion input really is the stem
    assert(run(Seq("querries~1"), Map.empty) == Set(1L, 2L, 3L))
    // un-analyzed members would miss: 'scans' is not a corpus term
    assert(run(Seq("lookup"), Map("lookup" -> Seq("scans"))) == Set(1L, 2L, 4L))
    // a term that is ONLY a stopword analyzes to nothing → hard error,
    // not a match-nothing MUST
    intercept[IllegalArgumentException] {
      run(Seq("the"), Map.empty)
    }
    // fuzzy terms skip synonym expansion (Lucene's term-level rewrite):
    // a synonym keyed on the analyzed fuzzy term must not widen the group
    assert(run(Seq("querries~0"), Map("querry" -> Seq("scan"))) == Set.empty)
  }

  test("BM25F: field weights scale tf before saturation") {
    import spark.implicits._
    val fielded = Seq(
      (1L, "ranking systems", "data engine"),        // term in TITLE only
      (2L, "data retrieval with data joins", "misc"), // term twice in BODY
      (3L, "nothing relevant", "other topics")
    ).toDF("doc_id", "body", "title")
    val ix3 = Index.buildFielded(fielded,
      Seq("body" -> 1.0, "title" -> 3.0), idCol = "doc_id")
    // combined tf: doc1 = 3.0 (1 title hit × w3), doc2 = 2.0 (2 body hits)
    val tfs = ix3.postings.filter(col("term") === "data")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(tfs == Map(1L -> 3.0, 2L -> 2.0))
    // dl' is the weighted length: doc1 = 2·1 + 2·3 = 8
    assert(ix3.docLens.filter(col("doc_id") === 1)
      .collect()(0).getDouble(1) == 8.0)
    // the single weighted title hit must outrank two saturating body hits
    val top = Search.scoreBm25(ix3, Seq("data"), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L), s"title weighting must lead the ranking: $top")
    // idf counts a doc once per term in ANY field: df(data) = 2
    val df = ix3.postings.filter(col("term") === "data")
      .select(countDistinct(col("doc_id"))).collect()(0).getLong(0)
    assert(df == 2L)
  }

  test("dismax: best-field + tie, per-field statistics stay separate") {
    import spark.implicits._
    val fielded = Seq(
      (1L, "data", "long body about other retrieval topics entirely here"),
      (2L, "misc title", "data data appears twice in this body text now"),
      (3L, "unrelated", "nothing relevant at all in this one really")
    ).toDF("doc_id", "title", "body")
    val ixT = Index.build(fielded, textCol = "title")
    val ixB = Index.build(fielded, textCol = "body")
    def scores(tie: Double, boostT: Double = 1.0): Map[Long, Double] =
      Search.dismaxAllBm25(Seq(ixT -> boostT, ixB -> 1.0),
          Seq("data"), tie = tie)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sT = Search.scoreAllBm25(ixT, Seq("data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sB = Search.scoreAllBm25(ixB, Seq("data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 scores in title space only, doc 2 in body space only — each
    // field normalizes by its OWN avgdl (1-token title vs 9-token bodies)
    assert(sT.keySet == Set(1L) && sB.keySet == Set(2L))
    // tie = 0: pure max — each doc keeps exactly its best field score
    val t0 = scores(0.0)
    assert(t0.keySet == Set(1L, 2L))
    assert(math.abs(t0(1L) - sT(1L)) < 1e-12 &&
      math.abs(t0(2L) - sB(2L)) < 1e-12, t0.toString)
    // tie = 1: degenerates to the per-field sum
    val t1 = scores(1.0)
    assert(math.abs(t1(1L) - sT(1L)) < 1e-12 && math.abs(t1(2L) - sB(2L)) < 1e-12)
    // boost scales a field's contribution before the max/tie combine
    val boosted = scores(0.0, boostT = 5.0)
    assert(math.abs(boosted(1L) - 5.0 * sT(1L)) < 1e-12, boosted.toString)
    // contract guards
    intercept[IllegalArgumentException](
      Search.dismaxAllBm25(Nil, Seq("data"), 0.0))
    intercept[IllegalArgumentException](
      Search.dismaxAllBm25(Seq(ixT -> 1.0), Seq("data"), 1.5))
  }

  test("LM Dirichlet / Jelinek-Mercer: formula exact on the tiny corpus") {
    // corpus stats by hand: T = 18 total tokens; cf(spark) = 2, cf(data) = 3
    val mu = 2000.0
    def dir(tf: Double, dl: Double, cf: Double): Double =
      math.max(0.0, math.log(1.0 + tf * 18.0 / (mu * cf)) + math.log(mu / (dl + mu)))
    val d = Search.scoreAllLmDirichlet(ix, Seq("spark", "data"), mu)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d.keySet == Set(1L, 2L, 3L)) // doc 4 has neither term
    assert(math.abs(d(1L) - (dir(1, 5, 2) + dir(1, 5, 3))) < 1e-12)
    assert(math.abs(d(2L) - dir(1, 4, 3)) < 1e-12)
    assert(math.abs(d(3L) - d(1L)) < 1e-12) // same tf/dl profile as doc 1
    // Dirichlet rewards the doc that covers both terms over the one-term doc
    assert(d(1L) > d(2L))

    def jm(tf: Double, dl: Double, cf: Double): Double =
      math.log(1.0 + (0.9 * tf / dl) * 18.0 / (0.1 * cf))
    val j = Search.scoreAllLmJelinekMercer(ix, Seq("spark", "data"), 0.1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(j(1L) - (jm(1, 5, 2) + jm(1, 5, 3))) < 1e-12)
    assert(math.abs(j(2L) - jm(1, 4, 3)) < 1e-12)

    // Lucene's zero clip: a long doc whose use of a common term is BELOW
    // the collection rate scores 0, never negative (mu small enough that
    // the length penalty dominates: tf=1/dl=10 vs cf/T = 5/14)
    import spark.implicits._
    val c2 = Index.build(Seq(
      (1L, "t t t t"),
      (2L, "t u u u u u u u u u")).toDF("doc_id", "text"))
    val clip = Search.scoreAllLmDirichlet(c2, Seq("t"), mu = 3.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(clip(2L) == 0.0, s"below-collection-rate term must clip: $clip")
    assert(clip(1L) > 0.0)
    // contract guards
    intercept[IllegalArgumentException](Search.scoreAllLmDirichlet(ix, Seq("t"), 0.0))
    intercept[IllegalArgumentException](Search.scoreAllLmJelinekMercer(ix, Seq("t"), 1.0))
  }

  test("collapse: one representative per key, ranked by its score") {
    import spark.implicits._
    val sited = Seq(
      (1L, "a.com", "data data data filler filler"),
      (2L, "a.com", "data filler filler filler filler"),
      (3L, "b.com", "data data filler filler filler"),
      (4L, "b.com", "nothing relevant here at all")
    ).toDF("doc_id", "site", "text")
    val r = Search.collapseTopK(sited, Index.build(sited), Seq("data"),
      collapseCol = "site", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(2))).toList
    // doc 1 beats doc 2 within a.com (tf 3 vs 1); doc 3 represents b.com;
    // doc 4 never matches; global order = representative score desc
    assert(r == List((1L, "a.com"), (3L, "b.com")), r.toString)
    // k bounds the GROUPS, not the match set
    val r1 = Search.collapseTopK(sited, Index.build(sited), Seq("data"),
      collapseCol = "site", k = 1).collect().map(_.getLong(0)).toList
    assert(r1 == List(1L))
  }

  test("block join: parent scores aggregate matching children") {
    import spark.implicits._
    val kids = Seq(
      (10L, 101L, "data data data pad pad"),  // strong child of 10
      (10L, 102L, "data pad pad pad pad"),    // weak child of 10
      (20L, 201L, "data data pad pad pad"),   // middling child of 20
      (20L, 202L, "no match here at all"),
      (30L, 301L, "irrelevant child entirely")
    ).toDF("parent_id", "child_id", "text")
    def run(mode: String) =
      Search.blockJoinTopK(kids, Seq("data"), k = 10, scoreMode = mode)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val mx = run("max")
    assert(mx.map(_._1).toList == List(10L, 20L), mx.mkString(","))
    assert(mx.head._3 == 101L, "best child must be the top-scoring chunk")
    // ScoreMode.Max: parent 10's score is child 101's score exactly
    val cs = Search.scoreBm25(Index.build(kids, idCol = "child_id"),
      Seq("data"), k = 10).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mx.head._2 == cs(101L))
    // Total sums both matching children of parent 10
    val tot = run("total").find(_._1 == 10L).get
    assert(math.abs(tot._2 - math.rint((cs(101L) + cs(102L)) * 1e4) / 1e4) < 1e-9)
    intercept[IllegalArgumentException](run("median"))
  }

  test("MaxScore: partition proves the prune, results equal unpruned BM25") {
    import spark.implicits._
    val corpus = ((1L to 20L).map(i => (i, s"common filler number$i")) ++
      Seq(21L -> "rare common things", 22L -> "very rare item"))
      .toDF("doc_id", "text")
    val cix = Index.build(corpus)
    val plan = Search.maxScorePartition(cix, Seq("rare", "common"), k = 2)
    // 'common' matches 21 of 22 docs → tiny idf; both rare docs outscore
    // any common-only doc, so 'common' must partition as non-essential
    assert(plan.nonEssential == Seq("common"), plan.toString)
    assert(plan.essential == Seq("rare"))
    assert(plan.theta > plan.maxContrib("common"))
    // the contract: pruned == unpruned, here and on the fixture corpus
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(rows(Search.bm25TopKMaxScore(cix, Seq("rare", "common"), k = 2))
      == rows(Search.scoreBm25(cix, Seq("rare", "common"), k = 2)))
    val fixture = Index.build(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    for (q <- Seq(Seq("dup", "batch"), Seq("spark", "query"), Seq("absent"))) {
      assert(rows(Search.bm25TopKMaxScore(fixture, q, k = 10))
        == rows(Search.scoreBm25(fixture, q, k = 10)), s"query $q diverged")
    }
    // uniform-df queries degrade gracefully: nothing prunable, all essential
    val uni = Search.maxScorePartition(fixture, Seq("spark", "query"), k = 10)
    assert(uni.essential.toSet ++ uni.nonEssential.toSet == Set("spark", "query"))
  }

  test("MaxScore persisted: metadata bounds dominate exact maxima, results equal") {
    import spark.implicits._
    val corpus = ((1L to 20L).map(i => (i, s"common filler number$i")) ++
      Seq(21L -> "rare common things", 22L -> "very rare item"))
      .toDF("doc_id", "text")
    val cix = Index.build(corpus)
    val dir = java.nio.file.Files.createTempDirectory("wand_ix").toString
    Index.write(cix, dir)
    Index.writeTermBounds(spark, dir)
    val mem = Search.maxScorePartition(cix, Seq("rare", "common"), k = 2)
    val per = Search.maxScorePartitionPersisted(spark, dir,
      Seq("rare", "common"), k = 2)
    // the (max_tf, min_dl) bound can only be LOOSER than the exact maxima
    for (t <- Seq("rare", "common"))
      assert(per.maxContrib(t) >= mem.maxContrib(t) - 1e-12,
        s"$t: ${per.maxContrib(t)} < ${mem.maxContrib(t)}")
    // on this corpus it still proves the same partition...
    assert(per.nonEssential == Seq("common") && per.essential == Seq("rare"))
    // ...and serving equals the unpruned ranking
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(rows(Search.bm25TopKMaxScorePersisted(spark, dir,
        Seq("rare", "common"), k = 2))
      == rows(Search.scoreBm25(cix, Seq("rare", "common"), k = 2)))
    // absent terms degrade to the empty result, not an error
    assert(Search.bm25TopKMaxScorePersisted(spark, dir, Seq("zzz"), k = 2)
      .collect().isEmpty)
  }

  test("percolate: conjunctive musts, mustNot veto, no cross product semantics") {
    import spark.implicits._
    val subs = Seq(
      (10L, Seq("spark", "data"), Seq.empty[String]),   // docs 1, 3
      (20L, Seq("big"), Seq("results")),                // doc 1 (2 vetoed)
      (30L, Seq("big", "big"), Seq.empty[String]),      // dup terms dedupe
      (40L, Seq("missing"), Seq.empty[String])          // matches nothing
    ).toDF("query_id", "must", "must_not")
    val r = Search.percolate(docs, subs)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((1L, 10L), (3L, 10L), (1L, 20L), (1L, 30L), (2L, 30L)),
      r.toString)
  }

  test("trigram substring search: cross-token needles, verify kills FPs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "Spark makes BIG data simple"),
      (2L, "a bigger dataset"),
      (3L, "xxabcdyy zcdefq"),   // holds all grams of "abcdef", NOT the substring
      (4L, "the abcdef string"), // the true match
      (5L, "nothing here")
    ).toDF("doc_id", "text")
    val ix = Index.buildTrigram(corpus)
    def ids(needle: String): Set[Long] =
      Search.substringSearch(corpus, ix, needle)
        .collect().map(_.getLong(0)).toSet
    // case-insensitive, crosses a token boundary (space) — the query no
    // token index can answer without a corpus scan
    assert(ids("big DATA") == Set(1L))
    // candidate over-admission is removed by the verify: doc 3 holds
    // every trigram of 'abcdef' in scattered positions
    val cands = Search.substringIds(ix, "abcdef")
      .collect().map(_.getLong(0)).toSet
    assert(cands == Set(3L, 4L), s"gram intersection should admit both: $cands")
    assert(ids("abcdef") == Set(4L))
    // equality with brute force on every 3+ char needle we try
    for (n <- Seq("data", "set", "ing", "spark makes")) {
      val brute = corpus.filter(lower(col("text")).contains(n))
        .collect().map(_.getLong(0)).toSet
      assert(ids(n) == brute, s"needle '$n'")
    }
    // the verify runs over a SEMI-JOINED candidate set, not the corpus
    val plan = Search.substringSearch(corpus, ix, "abcdef")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected candidate semi-join:\n$plan")
    // sub-trigram needles fail loud instead of silently scanning
    intercept[IllegalArgumentException](Search.substringIds(ix, "ab"))
  }

  test("regex over trigrams: factor extraction sound, verify exact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark makes big data simple"),
      (2L, "big dataset on a table"),
      (3L, "the spark table story"),
      (4L, "nothing relevant")
    ).toDF("doc_id", "text")
    val ix = Index.buildTrigram(corpus)
    // factor extraction: optional chars excluded, '+' keeps its char,
    // unsafe metachars bail
    assert(Search.literalFactor("big data.*table").contains("big data"))
    assert(Search.literalFactor("abc?def").contains("def"))
    assert(Search.literalFactor("abc+def").contains("abc"))
    assert(Search.literalFactor("a|b").isEmpty)
    assert(Search.literalFactor("(abc)def").isEmpty)
    assert(Search.literalFactor("a.b.c").isEmpty) // no run reaches 3
    // end-to-end equals the brute-force regex scan
    val got = Search.regexpSubstringSearch(corpus, ix, "big data.*simple")
      .collect().map(_.getLong(0)).toSet
    val brute = corpus.filter(col("text").rlike("big data.*simple"))
      .collect().map(_.getLong(0)).toSet
    assert(got == brute && got == Set(1L), s"got $got")
    // a factor-free pattern fails loud instead of silently scanning
    intercept[IllegalArgumentException](
      Search.regexpSubstringSearch(corpus, ix, "a.b"))
  }

  test("autocomplete ranks completions by df, term tiebreak, window tight") {
    // corpus terms starting 's': spark (docs 1,3), simple (1), streaming
    // (3), streams (3), see (4)
    val got = Search.autocomplete(ix, "S", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.head == ("spark", 2L), got.mkString(","))
    // remaining df=1 terms arrive in term order
    assert(got.tail.map(_._1).toSeq == got.tail.map(_._1).sorted.toSeq)
    assert(got.forall(_._1.startsWith("s")))
    // k bounds the list; window excludes terms past the prefix bump
    assert(Search.autocomplete(ix, "s", 2).collect().length == 2)
    assert(Search.autocomplete(ix, "st", 10).collect()
      .forall(_.getString(0).startsWith("st")))
    intercept[IllegalArgumentException](Search.autocomplete(ix, "s!", 3))
    intercept[IllegalArgumentException](Search.autocomplete(ix, "s", 0))
  }

  test("phonetic match: soundex expansion, pinned oracle map verified") {
    import spark.implicits._
    // 'spork' sounds like 'spark' (S162) — found; 'data' (D300) vs
    // 'dita' (D300) matches; a different code does not
    val got = Search.matchPhoneticIds(ix, "spork")
      .collect().map(_.getLong(0)).toSet
    val withSpark = docs.filter(col("text").contains("spark"))
      .collect().map(_.getLong(0)).toSet
    assert(got == withSpark, s"got $got want $withSpark")
    assert(Search.matchPhoneticIds(ix, "dita").collect().nonEmpty)
    assert(Search.matchPhoneticIds(ix, "zzz").collect().isEmpty)
    intercept[IllegalArgumentException](Search.matchPhoneticIds(ix, "sp ork"))
    // the q_fts_phonetic oracle's pinned word→code map must agree with
    // Spark's soundex for EVERY fixture-vocabulary token (porter-map
    // pattern: the closed vocab is what makes the SQL replay exact)
    val pinned = Map("a" -> "A000", "agg" -> "A200", "batch" -> "B320",
      "big" -> "B200", "column" -> "C450", "customer" -> "C235",
      "data" -> "D300", "dup" -> "D100", "fast" -> "F230",
      "filter" -> "F436", "group" -> "G610", "hash" -> "H200",
      "join" -> "J500", "key" -> "K000", "line" -> "L500",
      "merge" -> "M620", "order" -> "O636", "part" -> "P630",
      "query" -> "Q600", "row" -> "R000", "scan" -> "S500",
      "slow" -> "S400", "small" -> "S540", "sort" -> "S630",
      "spark" -> "S162", "stream" -> "S365", "table" -> "T140",
      "the" -> "T000", "value" -> "V400", "vector" -> "V236",
      "window" -> "W530")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val vocab = spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(Analyzer.tokenize(col("text"))).as("w")).distinct()
        .select(col("w"), soundex(col("w")).as("code"))
        .collect().map(r => r.getString(0) -> r.getString(1))
      assert(vocab.nonEmpty)
      vocab.foreach { case (w, code) =>
        assert(pinned.get(w).contains(code),
          s"oracle soundex map stale for '$w': spark=$code map=${pinned.get(w)}")
      }
    }
  }

  test("crc32 matches JVM reference (oracle engine lacks crc32)") {
    import spark.implicits._
    val got = Seq("hello graft").toDF("s").select(crc32(col("s"))).collect()(0).getLong(0)
    val c = new java.util.zip.CRC32()
    c.update("hello graft".getBytes("UTF-8"))
    assert(got == c.getValue)
  }

  test("spanFirst: term must sit within the first n positions") {
    val pix = Index.buildPositional(docs)
    // 'spark' is token 0 of docs 1 and 3 → within first 1
    assert(Search.matchSpanFirst(pix, "spark", 1)
      .collect().map(_.getLong(0)).sorted === Array(1L, 3L))
    // 'data' is position 3 in doc 1, 1 in doc 2, 3 in doc 3 → n=2 keeps only doc 2
    assert(Search.matchSpanFirst(pix, "data", 2)
      .collect().map(_.getLong(0)) === Array(2L))
    // n beyond every doc length degrades to plain contains
    assert(Search.matchSpanFirst(pix, "data", 100)
      .collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
  }

  test("spanNot: an occurrence of a with no b within dist") {
    val pix = Index.buildPositional(docs)
    // 'big' not within 1 of 'data': doc 1 big@2,data@3 adjacent → excluded;
    // doc 2 big@0,data@1,big@2 — big@2 is within 1 of data@1? |2-1|=1 ≤ 1 →
    // and big@0 |0-1|=1 → excluded too
    assert(Search.matchSpanNot(pix, "big", "data", 1)
      .collect().map(_.getLong(0)).isEmpty)
    // dist 0 = positions may never collide (they can't) → all docs with 'big'
    assert(Search.matchSpanNot(pix, "big", "data", 0)
      .collect().map(_.getLong(0)).sorted === Array(1L, 2L))
    // b absent from the doc entirely → a matches (left join null arm)
    assert(Search.matchSpanNot(pix, "results", "spark", 5)
      .collect().map(_.getLong(0)) === Array(2L))
  }

  test("significantTerms: foreground-only term outranks corpus-wide ones") {
    import spark.implicits._
    val fg = Seq(1L, 3L).toDF("doc_id") // the two 'spark' docs
    val top = Search.significantTerms(ix, fg, k = 3).collect()
    // 'spark' is in 2/2 fg docs and 2/4 corpus docs → highest lift
    assert(top.head.getString(0) == "spark")
    val s = top.head
    assert(s.getLong(1) == 2L && s.getLong(2) == 2L)
    // JLH = (1 − 0.5) · (1 / 0.5) = 1.0
    assert(math.abs(s.getDouble(3) - 1.0) < 1e-9)
    // 'data' (in all 3 content docs, 2 fg) scores lower than 'spark'
    val data = top.find(_.getString(0) == "data")
    assert(data.forall(_.getDouble(3) < 1.0))
  }

  test("rm3: expansion pulls in feedback-doc terms absent from the query") {
    // query 'spark' → fb docs 1,3; their terms (big/data/streaming/...)
    // join the expanded query, so doc 2 (no 'spark') can now score
    val r = Search.rm3TopK(ix, Seq("spark"), k = 4, fbDocs = 2, fbTerms = 3,
      lambda = 0.5).collect()
    val ids = r.map(_.getLong(0)).toSet
    assert(ids.contains(2L), s"expansion should reach doc 2, got ${ids.mkString(",")}")
    // λ=1 degrades to the original query: only spark docs match
    val strict = Search.rm3TopK(ix, Seq("spark"), k = 4, fbDocs = 2,
      fbTerms = 3, lambda = 1.0).collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L, 3L))
  }

  test("static-banded top-k: early termination, exact vs unbanded truth") {
    val corpus = spark.read.parquet(sf("documents"))
    val ix = Index.build(corpus)
    val out = graft.core.Scratch.dir("fts_static_banded_spec")
    Index.writeStaticBanded(ix,
      corpus.select(col("doc_id"), col("n_chars").as("score")),
      out, bandWidth = 80L, nBands = 8)
    val post = spark.read.parquet(s"$out/postings_banded")
    val nBandsPresent = post.select("band").distinct().count()
    val (res, read) = Search.topKStaticBanded(spark, out, "data", k = 5)
    // exactness against banding-free ground truth
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = corpus
      .filter(array_contains(Analyzer.tokenize(col("text")), "data"))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == truth, s"banded result diverged:\n$got\nvs\n$truth")
    // the point of the layout: the read stops before the last band
    assert(read.length < nBandsPresent,
      s"no early termination: read ${read.length} of $nBandsPresent bands")
    assert(read == read.sorted, "bands must be read best-first")
    // k larger than all matches → every band read, result complete
    val (all, readAll) = Search.topKStaticBanded(spark, out, "data", k = 100000)
    assert(readAll.length == nBandsPresent)
    assert(all.count() ==
      corpus.filter(array_contains(Analyzer.tokenize(col("text")), "data")).count())
  }

  test("suggestPhrase: LM prefers the rewrite that co-occurs") {
    import spark.implicits._
    // 'grape juice' dominates; 'gripe' exists but never precedes 'juice'
    val corpus = (Seq.fill(20)("grape juice is great") ++
      Seq.fill(20)("people gripe about things") ++ Seq("gripe juice once"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Search.suggestPhrase(corpus, Seq("grape", "juice"),
      maxEdits = 1, perSlot = 5, k = 2).collect()
    assert(got.head.getString(0) == "grape juice",
      s"LM should rank the co-occurring rewrite first: ${got.toSeq}")
    // both rewrites surface, the non-co-occurring one strictly lower
    val m = got.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.contains("gripe juice") && m("grape juice") > m("gripe juice"))
  }

  test("rescoreTopK: phrase boost reorders only inside the window") {
    val pix = Index.buildPositional(docs)
    val base = Search.scoreBm25(pix, Seq("big", "data"), 4).collect()
      .map(_.getLong(0)).toSeq
    val boosted = Search.rescoreTopK(pix, Seq("big", "data"),
      Seq("big", "data"), window = 4, k = 4, boost = 10.0).collect()
    // docs 1 and 2 contain the exact phrase "big data"; doc 3 matches
    // terms but not the phrase → boosted docs must rank first
    val order = boosted.map(_.getLong(0)).toSeq
    assert(order.take(2).toSet == Set(1L, 2L), s"base=$base boosted=$order")
    assert(boosted.take(2).map(_.getDouble(1)).forall(_ > 9.0))
  }

  test("searchAfter: pages tile the full ranking with no overlap or gap") {
    val full = Search.scoreBm25(ix, Seq("data", "big"), 10).collect()
    val p1 = full.take(2)
    val p2 = Search.searchAfter(ix, Seq("data", "big"), 2,
      afterScore = p1.last.getDouble(1), afterId = p1.last.getLong(0)).collect()
    assert((p1 ++ p2).map(_.getLong(0)).toSeq == full.map(_.getLong(0)).toSeq.take(p1.length + p2.length))
    assert(p1.map(_.getLong(0)).toSet.intersect(p2.map(_.getLong(0)).toSet).isEmpty)
  }
}
