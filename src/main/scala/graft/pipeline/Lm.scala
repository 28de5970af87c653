package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fts.Analyzer

/** Statistical-LM curation signals for training-data pipelines:
  * CCNet-style perplexity filtering against a reference corpus and
  * DSIR-style importance weighting toward a target distribution.
  *
  * Both follow the published recipes in spirit (CCNet scores web text with
  * a Wikipedia-trained KenLM; DSIR weights raw documents by a hashed-n-gram
  * importance ratio between target and raw distributions) but are built as
  * pure DataFrame aggregations over the frozen token grammar
  * ([[graft.fts.Analyzer]]) so every number is deterministic and
  * oracle-replayable — no external LM artifacts.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - model state is *vocabulary/bucket-sized*, never corpus-sized: a
  *    unigram count table for perplexity, a fixed 4096-row bucket table
  *    for DSIR. Both sit on the build side of a broadcast join; the corpus
  *    is never shuffled by token.
  *  - scoring is explode → broadcast-join → partial-aggregated groupBy on
  *    the doc id. A document's exploded tokens stay in the partition that
  *    read the document, so map-side combine collapses them to one partial
  *    row per doc before the only shuffle.
  *  - no driver state: totals (N, V) travel as broadcast one-row frames,
  *    not collected scalars.
  */
object Lm {

  /** Unigram counts of a reference corpus under the frozen grammar:
    * one row per distinct token. This is the whole "language model" —
    * vocabulary-sized, broadcastable. */
  def unigramCounts(train: DataFrame, textCol: String = "text"): DataFrame =
    train
      .select(explode(Analyzer.tokenize(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Per-document perplexity under an add-α-smoothed unigram LM trained on
    * `train` (CCNet's shape: score everything against a clean reference
    * corpus; low perplexity ≈ looks like the reference). For token t with
    * train count c(t), train size N and vocabulary V:
    *
    *   p(t) = (c(t) + α) / (N + α·(V+1))        (the +1 is the unseen bin)
    *   ppl(doc) = exp(−mean_t ln p(t)),  rounded to 4 decimals.
    *
    * Documents with zero tokens produce no row (no measurable stream).
    * Output: (doc_id, ppl). */
  def perplexity(docs: DataFrame, train: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", alpha: Double = 0.5): DataFrame = {
    val counts = unigramCounts(train, textCol)
    val totals = counts.agg(
      sum("cnt").cast("double").as("lm_n"),
      count(lit(1)).cast("double").as("lm_v"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(Analyzer.tokenize(col(textCol))).as("tok"))
      .join(broadcast(counts), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        log((coalesce(col("cnt"), lit(0L)).cast("double") + alpha) /
          (col("lm_n") + (col("lm_v") + 1.0) * alpha)).as("lp"))
      .groupBy("doc_id")
      .agg(round(exp(-avg("lp")), 4).as("ppl"))
  }

  /** CCNet-style perplexity BUCKETING (Wenzek et al. 2020 §4.4): split
    * each language's documents into head/middle/tail at that LANGUAGE'S
    * OWN perplexity tertiles under a reference-corpus LM — the published
    * "keep the head, sample the middle, drop the tail" quality policy
    * that avoids one global threshold penalizing whole languages.
    * Thresholds are a languages×2 aggregate (broadcast); assignment is a
    * broadcast join over the scored stream, so the operator adds nothing
    * beyond [[perplexity]]'s two passes. Boundary docs (ppl == tertile)
    * bucket downward, on the ROUNDED ppl both sides replay. Output:
    * (doc_id, lang, ppl, bucket). */
  def ccnetBuckets(docs: DataFrame, train: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", langCol: String = "lang",
                   alpha: Double = 0.5): DataFrame = {
    val ppl = perplexity(docs, train, idCol, textCol, alpha)
    val withLang = ppl.join(
      docs.select(col(idCol).as("doc_id"), col(langCol)), "doc_id")
    val thr = withLang.groupBy(langCol).agg(
      round(expr("percentile(ppl, 0.333333)"), 6).as("p33"),
      round(expr("percentile(ppl, 0.666667)"), 6).as("p66"))
    withLang.join(broadcast(thr), langCol :: Nil)
      .select(col("doc_id"), col(langCol), col("ppl"),
        when(col("ppl") <= col("p33"), "head")
          .when(col("ppl") <= col("p66"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Per-document perplexity under an INTERPOLATED KNESER-NEY bigram LM
    * (Kneser & Ney 1995, the smoothing KenLM ships and CCNet's quality
    * filter runs at 5-gram order; the relational form is order-agnostic,
    * shown at bigram order). With fixed discount D, context count c(v),
    * bigram count c(vw), and continuation statistics N1+:
    *
    *   p(w|v) = (max(c(vw)−D, 0) + D·N1+(v·)·Pcont(w)) / c(v)   seen context
    *          = Pcont(w)                                        unseen context
    *   Pcont(w) = N1+(·w) / N1+(··)
    *
    * plus a 1/(N1+(··)+1) floor for words never seen as a continuation
    * (the unseen bin, like [[perplexity]]'s +1). The trained state is
    * three VOCABULARY-scale count tables and one scalar — broadcastable
    * at any corpus size; scoring is broadcast joins over the documents'
    * bigram stream, so the whole operator is two linear passes. Counts
    * stay integer until the single p(w|v) division. Documents with fewer
    * than two tokens produce no row. Output: (doc_id, ppl). */
  def knPerplexity(docs: DataFrame, train: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"KN discount must be in (0,1), got $discount")
    def bigrams(c: Column): Column = {
      val t = Analyzer.tokenize(c)
      val n = greatest(size(t) - 1, lit(0))
      zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
        (v, w) => struct(v.as("v"), w.as("w")))
    }
    val cvw = train.select(explode(bigrams(col(textCol))).as("bg"))
      .select(col("bg.v").as("v"), col("bg.w").as("w"))
      .groupBy("v", "w").agg(count(lit(1)).as("cvw"))
    // c(v): occurrences of v as a context; N1+(v·): distinct continuations
    val ctx = cvw.groupBy("v").agg(
      sum(col("cvw")).as("cv"), count(lit(1)).as("n1pv"))
    val cont = cvw.groupBy("w").agg(count(lit(1)).as("n1pw"))
    val totals = cvw.agg(count(lit(1)).cast("double").as("n1pp"))
    val scored = docs
      .select(col(idCol).as("doc_id"), explode(bigrams(col(textCol))).as("bg"))
      .select(col("doc_id"), col("bg.v").as("v"), col("bg.w").as("w"))
      .join(broadcast(cvw), Seq("v", "w"), "left")
      .join(broadcast(ctx), Seq("v"), "left")
      .join(broadcast(cont), Seq("w"), "left")
      .crossJoin(broadcast(totals))
    // a bigram-free training corpus (all docs < 2 tokens) gives N1+(··)=0;
    // under ANSI that division would fail the whole stage — degrade to
    // Pcont = 0 so every doc hits the uniform floor instead (ppl = N1pp+1)
    val pcont = when(col("n1pp") > 0.0,
      coalesce(col("n1pw").cast("double"), lit(0.0)) / col("n1pp"))
      .otherwise(lit(0.0))
    val p = when(col("cv").isNotNull,
      (greatest(coalesce(col("cvw").cast("double"), lit(0.0)) - discount, lit(0.0)) +
        lit(discount) * col("n1pv").cast("double") * pcont) / col("cv").cast("double"))
      .otherwise(pcont)
    scored
      .select(col("doc_id"),
        log(when(p > 0.0, p).otherwise(lit(1.0) / (col("n1pp") + 1.0))).as("lp"))
      .groupBy("doc_id")
      .agg(round(exp(-avg("lp")), 4).as("ppl"))
  }

  /** Hashed-bigram feature stream of one document: a 3-hex-char md5 prefix
    * per adjacent token pair → 4096 buckets. The md5 prefix is the
    * engine-portable hash (same trick as [[Mixing]]'s md5 ordering): Spark
    * and any SQL oracle agree on md5 bytes, where builtin hash functions
    * differ. Docs with fewer than two tokens yield an empty stream.
    *
    * Native kernel ([[graft.ext.TextKernels.bigramBuckets]], codegen'd):
    * the previous `transform(starts, i => md5(…element_at(t, i)…))`
    * formulation re-evaluated its non-lambda subtree — the whole tokenize
    * — once per array ELEMENT (Catalyst does not hoist loop-invariant
    * expressions out of higher-order lambdas), making feature extraction
    * O(tokens²) per document. Same bytes out (LmSpec pins the md5
    * prefixes independently). */
  def bigramBuckets(textCol: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.ext.BigramBucketsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(textCol)))

  /** Number of distinct bucket keys `bigramBuckets` can emit (3 hex chars). */
  val DsirBuckets: Int = 4096

  /** DSIR-style importance weight toward the `isTarget` slice of the corpus:
    * per bucket b, the log-ratio of uniform-mixture-smoothed distributions
    *
    *   p_x(b) = (1−λ)·c_x(b)/N_x + λ/B,   lr(b) = ln p_t(b) − ln p_r(b)
    *
    * between the target and raw hashed-bigram feature streams; per document,
    * w = Σ_features lr(bucket(f)), rounded to 4 decimals. Positive ⇒ the
    * doc's n-gram profile looks more like the target slice than the raw
    * corpus — DSIR samples raw data proportional to exp(w). (Mixture
    * smoothing, not add-α: α·B pseudo-counts would swamp the observed
    * counts whenever a bucket's count is small relative to B, flipping
    * ratio signs; the λ-mixture perturbs every bucket by the same small
    * uniform mass at every corpus size.)
    *
    * ONE pass over the corpus: the tokenize+hash explode (the dominant
    * cost — global bucket counts must exist before scoring, so a naive
    * formulation explodes the corpus twice, once to count and once to
    * score) runs a single time into per-(doc, bucket) counts, which are
    * persisted (MEMORY_AND_DISK — 3 narrow columns, ≤ one row per
    * distinct (doc, bucket), far smaller than the feature stream; spills
    * rather than recomputes at corpus scale). Global counts, totals, and
    * the per-doc score all derive from that frame; the bucket/ratio
    * tables are ≤ B rows and broadcast. Per-doc score Σ_features lr(b)
    * regroups as Σ_b c·lr(b). Docs with <2 tokens have no features and
    * produce no row. Output: (doc_id, dsir_w). */
  def dsirWeights(docs: DataFrame, isTarget: Column, idCol: String = "doc_id",
                  textCol: String = "text", lambda: Double = 0.01): DataFrame = {
    val feats = docs.select(col(idCol).as("doc_id"), isTarget.as("is_t"),
      explode(bigramBuckets(col(textCol))).as("b"))
    val perDoc = feats.groupBy("doc_id", "is_t", "b")
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = perDoc.groupBy("b").agg(sum("c").as("cr"),
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct"))
    val tot = cnt.agg(sum("cr").cast("double").as("nr"),
      sum("ct").cast("double").as("nt"))
    val uni = lambda / DsirBuckets
    // nt = 0 means the target slice contributed NO features (empty or
    // sub-2-token target docs): the importance ratio is undefined, and
    // under Spark 4's ANSI default the unguarded ct/0 would THROW mid-job.
    // Guarded -> lr NULL -> every dsir_w NULL: diagnosable in the output
    // frame instead of failing a corpus-scale stage. nr = 0 only when the
    // whole corpus is feature-free (then there are no rows to score).
    val ratios = cnt.crossJoin(tot)
      .select(col("b"),
        when(col("nt") > 0.0 && col("nr") > 0.0,
          log(col("ct").cast("double") / col("nt")
            * (1.0 - lambda) + uni) -
          log(col("cr").cast("double") / col("nr")
            * (1.0 - lambda) + uni)).as("lr"))
    perDoc
      .join(broadcast(ratios), Seq("b"))
      .groupBy("doc_id")
      .agg(round(sum(col("c") * col("lr")), 4).as("dsir_w"))
  }

  /** Overlapping token-window chunking (RAG/embedding prep): windows of
    * `chunkTokens` tokens every `stride` tokens, the trailing partial
    * window kept. chunk_id = window start / stride, so ids are dense and
    * deterministic without a window function — one narrow projection, no
    * shuffle at all; docs explode into their own chunks in place.
    * Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text). */
  def chunk(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    val t = Analyzer.tokenize(col(textCol))
    val starts = when(size(t) > 0, sequence(lit(0), size(t) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol).as("doc_id"), t.as("t"), explode(starts).as("s"))
      .select(col("doc_id"),
        (col("s") / stride).cast("long").as("chunk_id"),
        least(lit(chunkTokens), size(col("t")) - col("s")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("t"), col("s") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }
}
