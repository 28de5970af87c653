package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two canonical published web-curation recipes, frozen so every
  * number is engine-replayable:
  *
  *  - [[gopherQuality]] — the Gopher document-quality rules (Rae et al.
  *    2021, "Scaling Language Models: ... Gopher", arXiv:2112.11446,
  *    Table A1): doc-level stats thresholds. Emits every signal AND the
  *    per-rule verdicts, because a curation pipeline tunes thresholds —
  *    the signals are the artifact, the keep flag is a default.
  *  - [[c4Clean]] — the C4 cleaning pass (Raffel et al. 2020,
  *    arXiv:1910.10683 §2.2): line-level retention (terminal punctuation,
  *    ≥5 words, no "javascript"), then page-level drops (<3 kept lines,
  *    "lorem ipsum", '{').
  *
  * Scale shape: both are single narrow projections — split → per-element
  * predicates over SMALL arrays (a document's own lines/words; every
  * lambda references only its lambda variable or cheap attributes) → one
  * row out per row in. No shuffle, no UDF, no driver state; they inherit
  * the scan's partitioning and pushdown. At 100 TB these run at IO speed
  * alongside whatever scan feeds them. */
object Curation {

  /** Gopher's closed-class stop set (Table A1's "must contain at least 2
    * of ..."). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def words(textCol: Column): Column =
    filter(split(textCol, "\\s+"), w => length(w) > 0)

  private def lines(textCol: Column): Column = split(textCol, "\n")

  /** Occurrences of literal `sym` in `c` (length-delta counting — exact,
    * engine-portable; overlap-free for the symbols used here). */
  private def countOf(c: Column, sym: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(sym), "")))
      / sym.length).cast("long")

  /** WINSORIZED group statistics (Tukey's robust-scaling staple; in a
    * curation run it is how per-slice quality/length statistics stop
    * being hostage to a handful of pathological documents): per group,
    * exact linear-interpolated percentiles [lo, hi] over `valCol`, every
    * value clamped into the band, plus clip counts and the winsorized
    * mean.
    *
    * Plan: one percentile aggregation per group (Spark's exact
    * `percentile` buffers a value→count map — fine while the value domain
    * is bounded, e.g. document lengths; `approx_percentile` is the
    * documented unbounded-domain fallback), then a broadcast join of the
    * group-cardinality bounds frame back onto the rows — no second
    * shuffle. Percentile interpolation and the winsorized mean are
    * RATIONAL, so outputs take floor-form rounding ([[graft.core.Num]]).
    * Both engines define quantiles as lower + frac·(upper − lower) at
    * position (n−1)·p (Spark `percentile` ≡ DuckDB `quantile_cont`). */
  def winsorizeStats(docs: DataFrame, groupCol: String, valCol: String,
                     lo: Double, hi: Double): DataFrame = {
    require(0.0 <= lo && lo < hi && hi <= 1.0, "need 0 ≤ lo < hi ≤ 1")
    val bounds = docs.groupBy(groupCol).agg(
      expr(s"percentile($valCol, $lo)").as("plo"),
      expr(s"percentile($valCol, $hi)").as("phi"))
    val v = col(valCol).cast("double")
    docs.join(broadcast(bounds), groupCol)
      .withColumn("wv",
        when(v < col("plo"), col("plo"))
          .when(v > col("phi"), col("phi")).otherwise(v))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        graft.core.Num.roundHalfUp(min(col("plo")), 4).as("p_lo"),
        graft.core.Num.roundHalfUp(min(col("phi")), 4).as("p_hi"),
        sum(when(v < col("plo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(v > col("phi"), 1L).otherwise(0L)).as("n_clip_hi"),
        graft.core.Num.roundHalfUp(avg(col("wv")), 2).as("mean_win"))
  }

  /** Per-document Gopher quality signals + per-rule verdicts + the overall
    * keep. Frozen definitions (the paper's, with the measurable reading
    * pinned here so oracles replay):
    *   words = whitespace-split non-empty; lines = '\n'-split.
    *   R1 50 ≤ n_words ≤ 100000        R2 3 ≤ mean word length ≤ 10
    *   R3 (count('#')+count('...'))/n_words ≤ 0.1
    *   R4 fraction of lines starting with a bullet ('- ', '* ', '• ') ≤ 0.9
    *   R5 fraction of lines ending with '...' ≤ 0.3
    *   R6 fraction of words containing an alphabetic char ≥ 0.8
    *   R7 at least 2 DISTINCT of [[GopherStops]] present as words.
    * Ratios are rounded to 6 dp before thresholding (integer/integer
    * ratios are exact in double, the rounding pins ties cross-engine).
    * A zero-word document's per-word ratios are explicitly NULL (guarded —
    * Spark 4's ANSI default makes a bare x/0 THROW mid-job, and an empty
    * document must be a keep=false row, never a failed stage) and `keep`
    * is false via R1; DuckDB's /0 is NULL, so the oracle agrees without a
    * guard. CurationSpec pins it. */
  def gopherQuality(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val w = words(col(textCol))
    val l = lines(col(textCol))
    // per-word ratios guard the zero-word divisor explicitly: Spark 4 runs
    // ANSI-on by default, where a bare x/0 THROWS mid-job — an empty
    // document must be a keep=false ROW, never a failed stage. ('\n'-split
    // lines are never empty: size(l) >= 1 always.)
    def perWord(x: Column): Column =
      when(size(col("w")) > 0, round(x / size(col("w")), 6))
    docs.select(col(idCol), w.as("w"), l.as("l"),
        (countOf(col(textCol), "#") + countOf(col(textCol), "...")).as("syms"))
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        perWord(aggregate(col("w"), lit(0L), (a, x) => a + length(x))
          .cast("double")).as("mean_word_len"),
        perWord(col("syms").cast("double")).as("symbol_ratio"),
        round(size(filter(col("l"), x =>
          x.startsWith("- ") || x.startsWith("* ") || x.startsWith("• ")))
          .cast("double") / size(col("l")), 6).as("bullet_frac"),
        round(size(filter(col("l"), x => x.endsWith("...")))
          .cast("double") / size(col("l")), 6).as("ellipsis_frac"),
        perWord(size(filter(col("w"), x => x.rlike("[a-zA-Z]")))
          .cast("double")).as("alpha_word_frac"),
        size(array_intersect(col("w"), array(GopherStops.map(lit): _*)))
          .cast("long").as("n_stop_kinds"))
      .withColumn("keep",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_frac") <= 0.9 &&
          col("ellipsis_frac") <= 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("n_stop_kinds") >= 2L)
  }

  /** C4 cleaning: per line keep iff it ends in terminal punctuation
    * ('.', '!', '?', '"'), has ≥ 5 whitespace words, and does not contain
    * "javascript" (case-insensitive); then drop the PAGE when fewer than
    * 3 lines survive, or the raw text contains "lorem ipsum"
    * (case-insensitive) or '{'. Returns every input row with the cleaned
    * text, kept-line count, and the page verdict — callers filter on
    * `keep` (dropping rows here would hide WHY a page died, and the audit
    * trail is the point of a curation pass). */
  def c4Clean(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val keptLines = filter(lines(col(textCol)), ln =>
      (ln.endsWith(".") || ln.endsWith("!") || ln.endsWith("?") ||
        ln.endsWith("\"")) &&
        size(filter(split(ln, "\\s+"), w => length(w) > 0)) >= 5 &&
        !lower(ln).contains("javascript"))
    docs.select(col(idCol), col(textCol), keptLines.as("kl"))
      .select(col(idCol),
        array_join(col("kl"), "\n").as("clean_text"),
        size(col("kl")).cast("long").as("n_lines_kept"),
        (size(col("kl")) >= 3 &&
          !lower(col(textCol)).contains("lorem ipsum") &&
          !col(textCol).contains("{")).as("keep"))
  }

  /** T5-style SPAN CORRUPTION (Raffel et al. 2020 §3.1.4 — the denoising
    * objective's offline data prep): mask token spans, replace each
    * masked span in the INPUT with one sentinel, emit the TARGETS as the
    * sentinel-prefixed masked spans. The paper samples span positions;
    * this variant is fully DETERMINISTIC — fixed `span`-token groups,
    * group g of doc d masked iff the first 3 md5 hex chars of "d:g" fall
    * under rate·4096 — so any worker, any retry, any engine regenerates
    * the identical example pair (the q_pipeline_sample_det philosophy:
    * content-derived pseudo-randomness over RNG state).
    *
    * Pure narrow projection over the token array — no shuffle, no UDF;
    * composes into any curation chain at any corpus size. Output:
    * (idCol, corrupted, targets, n_masked). */
  def spanCorrupt(docs: DataFrame, span: Int = 3, rate: Double = 0.15,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(span >= 1, "span must be positive")
    require(rate > 0 && rate < 1, s"rate must be in (0,1), got $rate")
    val thr = math.round(rate * 4096).toInt
    val t = graft.fts.Analyzer.tokenize(col(textCol))
    val ng = ceil(size(col("t")).cast("double") / span).cast("int")
    val masked = filter(sequence(lit(0), ng - 1), g =>
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        g.cast("string"))), 1, 3), 16, 10).cast("int") < thr)
    val sentinel = (i: Column) => concat(lit("<extra_id_"),
      i.cast("string"), lit(">"))
    docs.select(col(idCol), t.as("t"))
      .select(col(idCol), col("t"), masked.as("mg"))
      .select(col(idCol),
        array_join(filter(transform(col("t"), (tok, p) => {
          val g = (p / span).cast("int")
          val idx = array_position(col("mg"), g)
          when(idx === 0, tok)                      // unmasked group
            .when(p % span === 0, sentinel(idx - 1)) // span head → sentinel
            .otherwise(lit(null))                    // masked tail → drop
        }), x => x.isNotNull), " ").as("corrupted"),
        array_join(transform(col("mg"), (g, i) =>
          concat(sentinel(lit(i)), lit(" "),
            array_join(slice(col("t"), g * span + lit(1), lit(span)), " "))),
          " ").as("targets"),
        size(col("mg")).as("n_masked"))
  }
}
