package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fts.Analyzer

/** Text-analysis operators for training-data pipelines: quality scoring,
  * token counting, language ID, and content fingerprinting — all as
  * codegen'd column expressions over the frozen token grammar
  * (graft.fts.Analyzer), no UDFs in the hot path.
  */
object TextStats {

  /** English-y stopwords present in the fixture vocabulary; the heuristics
    * only need SOME closed-class word list, frozen like the token grammar. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is")

  /** BPE-ish subword token estimate: ceil(chars/4), the classic
    * bytes-per-token approximation. THE shared definition — quality stats,
    * token budgeting (q_pipeline_full, q_split_hash), and sequence packing
    * ([[Packing]]) must all agree or bin/split boundaries silently drift. */
  def estBpeTokens(textCol: Column): Column =
    ceil(length(textCol).cast("double") / 4.0).cast("long")

  /** Duplicate n-gram fraction — the Gopher-style REPETITION signal:
    * (total n-grams − distinct n-grams) / total. Highly repetitive
    * machine-generated or boilerplate text scores high and gets filtered;
    * 0.0 for docs shorter than n tokens (nothing to repeat). Pure column
    * expression over the frozen grammar — composes into any curation
    * filter chain. */
  def repetitionFrac(textCol: Column, n: Int = 3): Column = {
    // native kernels for both counts — the declarative shingle composition
    // (transform over sequence + concat_ws) is interpreted per token and
    // cost 18 s at sf0.1; the distinct-shingle-hash kernel is one compiled
    // call per row (64-bit hash collisions ≈ 1e-9, same accepted basis as
    // the dedup stack)
    def k(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      org.apache.spark.sql.GraftColumnBridge.column(e)
    def x(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
      org.apache.spark.sql.GraftColumnBridge.expression(c)
    val total = size(k(graft.ext.FtsTokenize(x(textCol)))) - (n - 1)
    val distinct = size(k(graft.ext.ShingleHashesExpr(x(textCol), n)))
    when(total > 0,
      round((total - distinct).cast("double") / total, 4)).otherwise(0.0)
  }

  /** FLESCH READING EASE (Flesch 1948; the readability staple curation
    * stacks gate on): 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), per document. Frozen measurable reading:
    * words = the analyzer's tokens; sentences = max(1, count of '.'+'!'+
    * '?'); syllables(word) = max(1, vowel-run count over [aeiouy]). Pure
    * per-row projection — no shuffle at any corpus size. All inputs are
    * exact integers, so the score is RATIONAL → floor-form rounding
    * ([[graft.core.Num]]); zero-word docs are NULL (ANSI /0 guard). */
  def readability(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    def runs(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    val sentences = greatest(lit(1L),
      runs(col(textCol), "[.!?]"))
    val d = docs.select(col(idCol),
      Analyzer.tokenize(col(textCol)).as("t"), sentences.as("sentences"))
      .withColumn("words", size(col("t")).cast("long"))
      .withColumn("syllables", aggregate(col("t"), lit(0L),
        (acc, w) => acc + greatest(lit(1L),
          size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long"))))
    d.select(col(idCol), col("words"), col("sentences"), col("syllables"),
      when(col("words") > 0, graft.core.Num.roundHalfUp(
        lit(206.835)
          - lit(1.015) * (col("words").cast("double") / col("sentences").cast("double"))
          - lit(84.6) * (col("syllables").cast("double") / col("words").cast("double")),
        2)).as("flesch"))
  }

  /** KWIC CONCORDANCE (keyword-in-context — the corpus-exploration view
    * every linguistics/search tool ships): one row per occurrence of
    * `term` with `window` tokens of context each side. Tokenize →
    * posexplode → filter is a pure per-row pipeline (the filter prunes
    * before any context materializes); contexts come from array slices
    * of the doc's own token list, so nothing joins and nothing
    * shuffles — at 100 TB this is a scan. */
  def kwic(docs: DataFrame, term: String, window: Int = 2,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 0, "window must be non-negative")
    docs.select(col(idCol), Analyzer.tokenize(col(textCol)).as("t"))
      .select(col(idCol), col("t"),
        posexplode(col("t")).as(Seq("p0", "tok")))
      .filter(col("tok") === term)
      .withColumn("i", (col("p0") + 1).cast("int"))
      .select(col(idCol), col("i"),
        concat_ws(" ", slice(col("t"),
          greatest(lit(1), col("i") - window),
          col("i") - greatest(lit(1), col("i") - window))).as("left_ctx"),
        concat_ws(" ", slice(col("t"), col("i") + 1, lit(window)))
          .as("right_ctx"))
  }

  /** JENSEN–SHANNON DIVERGENCE between two corpus slices' unigram
    * distributions (the mixture-shift diagnostic: how far does slice A's
    * token distribution sit from slice B's — 0 = identical, ln 2 =
    * disjoint; symmetric and finite, unlike KL): rows where `sliceCol` is
    * true form P, the rest form Q. One tokenize→explode→groupBy pass
    * builds both term-count vectors simultaneously (map-side combined;
    * the shuffle carries the vocabulary, never the corpus), then the
    * divergence is a single aggregation over the vocab. Zero-probability
    * terms contribute 0 to their side's KL half by convention. Output in
    * NATS, transcendental → round(4). */
  def jsDivergence(docs: DataFrame, sliceCol: Column,
                   textCol: String = "text"): DataFrame = {
    val occ = docs.select(sliceCol.as("in_p"),
        explode(Analyzer.tokenize(col(textCol))).as("term"))
    val cnt = occ.groupBy("term").agg(
      sum(when(col("in_p"), 1L).otherwise(0L)).as("cp"),
      sum(when(!col("in_p"), 1L).otherwise(0L)).as("cq"))
    val tot = cnt.agg(sum(col("cp")).as("tp"), sum(col("cq")).as("tq"))
    cnt.crossJoin(broadcast(tot))
      .select(col("cp"), col("cq"),
        (col("cp").cast("double") / col("tp").cast("double")).as("p"),
        (col("cq").cast("double") / col("tq").cast("double")).as("q"))
      .agg(
        sum(when(col("cp") > 0, lit(1L)).otherwise(0L)).as("n_terms_p"),
        sum(when(col("cq") > 0, lit(1L)).otherwise(0L)).as("n_terms_q"),
        round(
          sum(when(col("cp") > 0,
            lit(0.5) * col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))))
            .otherwise(0.0)) +
          sum(when(col("cq") > 0,
            lit(0.5) * col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
            .otherwise(0.0)), 4).as("jsd_nats"))
  }

  /** Per-doc quality/statistics row:
    * token counts, distinct ratio, mean token length, stopword ratio, and a
    * BPE-ish subword token estimate (chars/4 is the classic approximation;
    * the regex term count is the whitespace/word-boundary count). */
  def qualityStats(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = Analyzer.tokenize(col(textCol))
    // zero-token divisor guarded explicitly: Spark 4's ANSI default makes
    // a bare x/0 THROW mid-job — one empty document must yield NULL ratio
    // signals, never a failed 100 TB stage. (DuckDB's /0 is NULL, so the
    // oracle agrees without a guard.)
    def perTok(x: Column): Column =
      when(size(toks) > 0, round(x / size(toks), 4))
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      perTok(size(array_distinct(toks)).cast("double")).as("distinct_ratio"),
      perTok(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double"))
        .as("mean_tok_len"),
      perTok(size(filter(toks, t => t.isin(Stopwords: _*))).cast("double"))
        .as("stop_ratio"),
      estBpeTokens(col(textCol)).as("est_bpe_tokens"),
      // BPE-ish subword count: greedy ≤4-char pieces of alphanumeric runs —
      // a deterministic regex stand-in for a real subword vocabulary (the
      // actual BPE merge table is model-specific); cheap, engine-portable,
      // and tracks true subword counts closely enough for length filters
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]{1,4}"), lit(0)))
        .cast("long").as("n_bpe_pieces"))
  }

  /** N-gram-profile language heuristic: score = stopword density; docs with
    * enough closed-class English words are tagged "en". (The fixture text is
    * synthetic English regardless of its `lang` label — the point is the
    * deterministic, frozen heuristic, not linguistics.) */
  def langGuess(textCol: Column): Column = {
    val toks = Analyzer.tokenize(textCol)
    // guarded ratio (ANSI /0 throws): a token-free doc has NULL density,
    // and NULL >= 0.02 is NULL -> the otherwise branch tags it "unk"
    val ratio = when(size(toks) > 0,
      size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks))
    when(ratio >= 0.02, lit("en")).otherwise(lit("unk"))
  }

  /** Polynomial rolling-hash document fingerprint over the token stream:
    * fp = fold(tokens, h -> (h*31 + tokenCode) mod (2³¹−1)) where
    * tokenCode = 131*len(t) + first char — order-sensitive (unlike a token
    * set), cheap, and expressible identically in any SQL engine. Kept inside
    * [0, 2³¹) so no ANSI overflow is possible. */
  def fingerprint(textCol: Column): Column = {
    val p = 2147483647L
    val codes = transform(Analyzer.tokenize(textCol),
      t => (length(t).cast("long") * 131L + ascii(substring(t, 1, 1)).cast("long")))
    aggregate(codes, lit(0L), (h, c) => pmod(h * 31L + c, lit(p)))
  }

  /** RAKE keyword extraction (Rapid Automatic Keyword Extraction — Rose,
    * Engel, Cramer & Cowley 2010): candidate phrases are the maximal runs
    * of non-stopword tokens; each word scores deg(w)/freq(w) where freq
    * counts the word's occurrences in candidates and deg adds the length
    * of every candidate containing it (longer co-occurrence context =
    * stronger word); a phrase scores the sum of its words' scores. Emits
    * the top `perDoc` distinct phrases per document.
    *
    * All statistics are DOCUMENT-LOCAL (RAKE's definition), so every
    * aggregation and the final window key on doc_id — the whole operator
    * is embarrassingly parallel over documents at any corpus size, with
    * no corpus-wide shuffle at all. Word stats stay integer (sum of
    * lengths / count) until one exact division; the phrase-run split is
    * a running stopword count over positions, not a per-token loop. */
  def rakeKeywords(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", perDoc: Int = 3): DataFrame = {
    require(perDoc >= 1, "perDoc must be positive")
    val win = org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(Analyzer.tokenize(col(textCol))).as(Seq("p", "tok")))
    val isStop = col("tok").isin(Stopwords: _*)
    val grouped = toks.withColumn("grp",
        sum(when(isStop, 1L).otherwise(0L))
          .over(win.partitionBy("doc_id").orderBy("p")))
      .filter(!isStop)
    val phrases = grouped.groupBy("doc_id", "grp").agg(
        count(lit(1)).as("len"),
        array_join(transform(sort_array(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("phrase"),
        collect_list(col("tok")).as("words"))
    val phraseWords = phrases.select(col("doc_id"), col("grp"), col("len"),
      explode(col("words")).as("word"))
    val wordScores = phraseWords.groupBy("doc_id", "word").agg(
      (sum(col("len")).cast("double") / count(lit(1))).as("wscore"))
    val phraseScores = phraseWords.join(wordScores, Seq("doc_id", "word"))
      .groupBy("doc_id", "grp").agg(round(sum(col("wscore")), 4).as("score"))
    val named = phrases.select(col("doc_id"), col("grp"), col("phrase"))
      .join(phraseScores, Seq("doc_id", "grp"))
      .select("doc_id", "phrase", "score").distinct()
    named.withColumn("rn", row_number().over(
        win.partitionBy("doc_id").orderBy(col("score").desc, col("phrase"))))
      .filter(col("rn") <= perDoc).drop("rn")
      .orderBy(col("doc_id"), col("score").desc, col("phrase"))
  }

  /** PII patterns the redaction pass scrubs, deliberately conservative and
    * engine-portable (no lookaround — RE2-compatible, so an oracle engine
    * replays them verbatim): emails, dotted-quad IPs, and NANP-style
    * 555 phone numbers. Real deployments extend this table; each entry is
    * (tag, pattern, replacement). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b555-\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** PII redaction + per-doc counts — the scrub step a training-data
    * pipeline runs before anything ships: counts are measured on the RAW
    * text (the audit numbers), then patterns replace in table order
    * (emails first so an address's digits can't half-match as something
    * else). A pure per-row projection of codegen'd regexp built-ins — no
    * shuffle, no UDF — so it fuses into whatever scan feeds it at any
    * corpus size. */
  def redactPii(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    val counts = PiiPatterns.map { case (tag, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .cast("long").as(s"n_$tag")
    }
    docs.select(col(idCol) +: redacted.as(textCol) +: counts: _*)
  }
}
