package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Num

/** TEXT-GENERATION EVALUATION METRICS — the measurement half of the
  * training-data loop (sacrebleu / rouge-score as in-engine relational
  * plans). A 100 TB pipeline that produces SFT or distillation pairs
  * needs to SCORE candidate generations against references at the same
  * scale it builds them, so these run as plain explode → groupBy → join
  * plans: per-pair work is linear in tokens, the only shuffles key on
  * (pair, n, gram), and nothing is ever all-pairs or driver-side.
  *
  * Determinism contract: clipped-match and total counts are exact
  * integers on both engines; rational ratios (ROUGE precision/recall/F1)
  * use the floor-form rounding of [[graft.core.Num.roundHalfUp]]; only
  * BLEU's exp/ln composition uses plain round (transcendental outputs
  * essentially never sit on the half boundary).
  */
object EvalText {

  /** Space-joined token n-grams; empty array below n tokens. (Guarded:
    * Spark's `sequence(1, 0)` counts DOWN, so the unguarded transform
    * would fabricate grams for short docs.) */
  def tokenNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Per (pair, n): clipped n-gram matches plus both sides' gram totals —
    * the shared kernel of BLEU (precision form) and ROUGE-N (recall
    * form). `pairs` carries (`pid`, `cand`, `ref`) with both text columns
    * already tokenized to array<string>.
    *
    * Plan: one explode per side → count per (pid, n, gram) → inner join
    * on that same key (co-partitioned after the aggregations, AQE keeps
    * it local) → Σ min(candCount, refCount). Totals come straight from
    * array lengths — no second scan of the exploded grams. Everything is
    * linear in corpus tokens × |ns|; gram keys live under their pair id,
    * so no cross-document hot key exists by construction. */
  def pairGramStats(pairs: DataFrame, ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "n-gram orders must be >= 1")
    def tagged(c: Column): Column =
      concat(ns.map(n => transform(tokenNgrams(c, n),
        g => struct(lit(n).as("n"), g.as("gram")))): _*)
    def counts(side: String, c: Column): DataFrame = pairs
      .select(col("pid"), explode(tagged(c)).as("t"))
      .groupBy(col("pid"), col("t.n").as("n"), col("t.gram").as("gram"))
      .agg(count(lit(1)).as(s"${side}_cnt"))
    val matched = counts("c", col("cand"))
      .join(counts("r", col("ref")), Seq("pid", "n", "gram"))
      .groupBy("pid", "n")
      .agg(sum(least(col("c_cnt"), col("r_cnt"))).as("matched"))
    // totals per (pid, n) without an explode: len − n + 1, floored at 0
    val totals = pairs.select(col("pid"),
        explode(lit(ns.toArray)).as("n"), col("cand"), col("ref"))
      .select(col("pid"), col("n"),
        greatest(size(col("cand")) - col("n") + 1, lit(0))
          .cast("long").as("cand_total"),
        greatest(size(col("ref")) - col("n") + 1, lit(0))
          .cast("long").as("ref_total"))
    totals.join(matched, Seq("pid", "n"), "left_outer")
      .na.fill(0L, Seq("matched"))
  }

  /** Corpus BLEU (Papineni et al. 2002, ACL — the MT headline metric):
    * modified n-gram precision p_n = Σ_pairs clipped matches / Σ_pairs
    * candidate grams for n = 1..maxN, brevity penalty
    * BP = min(1, e^(1−r/c)) over the corpus token totals, and
    * BLEU = BP · exp(Σ ln(p_n)/maxN). One row out: p_1..p_maxN, the
    * count totals, BP and BLEU; any p_n = 0 zeroes the geometric mean
    * (the standard corpus-BLEU convention, not smoothed).
    *
    * Scale: after [[pairGramStats]] the state is |pairs|·maxN rows → one
    * maxN-row aggregate → a 1×1 cross join with the length totals. The
    * corpus never concentrates anywhere: clipping happened per pair. */
  def bleu(pairs: DataFrame, maxN: Int = 4): DataFrame = {
    require(maxN >= 1, "maxN must be >= 1")
    val perN = pairGramStats(pairs, 1 to maxN)
      .groupBy("n")
      .agg(sum(col("matched")).as("m"), sum(col("cand_total")).as("t"))
    // t = 0 (no candidate grams at this order corpus-wide) must yield
    // p_n = 0, not 0/0 = NaN — the logsum/zero_ps guards below already
    // treat m = 0 as a zeroed precision, this pins the projection too
    val pcols = (1 to maxN).map(n =>
      Num.roundHalfUp(max(when(col("n") === n,
        when(col("t") > 0, col("m").cast("double") / col("t").cast("double"))
          .otherwise(lit(0.0)))), 4).as(s"p$n"))
    val folded = perN.agg(
      pcols.head, (pcols.tail :+
        sum(when(col("m") === 0, 1).otherwise(0)).as("zero_ps") :+
        sum(when(col("m") > 0,
          log(col("m").cast("double") / col("t").cast("double")))
          .otherwise(lit(0.0))).as("logsum")): _*)
    val lens = pairs.agg(
      sum(size(col("cand"))).cast("long").as("c_len"),
      sum(size(col("ref"))).cast("long").as("r_len"))
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast("double") /
        col("c_len").cast("double")))
    folded.crossJoin(lens)
      .select((1 to maxN).map(n => col(s"p$n")) ++ Seq(
        col("c_len"), col("r_len"), round(bp, 4).as("bp"),
        round(when(col("zero_ps") > 0, lit(0.0))
          .otherwise(bp * exp(col("logsum") / maxN)), 4).as("bleu")): _*)
  }

  /** ROUGE-N per pair (Lin 2004 — the summarization-eval staple):
    * precision = clipped matches / candidate grams, recall = clipped
    * matches / reference grams, F1 = 2m/(c+r) (the algebraic reduction
    * of 2PR/(P+R) — kept in integer space until one final division so
    * both engines round the same rationals). One row per (pid, n). */
  def rougeN(pairs: DataFrame, ns: Seq[Int] = Seq(1, 2)): DataFrame =
    pairGramStats(pairs, ns)
      .select(col("pid"), col("n"), col("matched"),
        col("cand_total"), col("ref_total"),
        Num.roundHalfUp(when(col("cand_total") > 0,
          col("matched").cast("double") / col("cand_total").cast("double"))
          .otherwise(lit(0.0)), 4).as("precision"),
        Num.roundHalfUp(when(col("ref_total") > 0,
          col("matched").cast("double") / col("ref_total").cast("double"))
          .otherwise(lit(0.0)), 4).as("recall"),
        Num.roundHalfUp(when(col("cand_total") + col("ref_total") > 0,
          (col("matched") * 2).cast("double") /
            (col("cand_total") + col("ref_total")).cast("double"))
          .otherwise(lit(0.0)), 4).as("f1"))
}
