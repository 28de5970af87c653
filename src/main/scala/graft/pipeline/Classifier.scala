package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fts.Analyzer

/** fastText-style LINEAR TEXT CLASSIFIER serving — the model-based filter
  * of a curation pipeline (quality / domain / toxicity scoring at corpus
  * scale). Architecture (Joulin et al., "Bag of Tricks for Efficient Text
  * Classification"): hashing-trick features (unigrams + adjacent bigrams,
  * each hashed to one of `buckets` ids), a weight per bucket, document
  * score = mean feature weight through a sigmoid.
  *
  * Serving shape, which is the point at 100 TB: featurization is a pure
  * codegen projection (tokenize + bigram concat + md5 bucket), the weight
  * TABLE (buckets rows — fastText uses 2M; here 256) broadcasts, scoring
  * is one explode → broadcast-join → partial-aggregating groupBy on the
  * doc id. No corpus-side shuffle beyond the per-doc aggregation, no UDF.
  * A real trained model drops in as any (bucket, w) frame; the default
  * here is a DETERMINISTIC hash-derived weight table (both engines can
  * re-derive it, so scoring is oracle-replayable end-to-end).
  *
  * Weights are INTEGERS (−10..10) on purpose: the per-doc sum is exact, so
  * `sigmoid(sum/(2·count))` sees bit-identical input on any engine and
  * aggregation order — no float-sum drift across partial aggregation.
  */
object Classifier {

  /** Bucket key of one feature: first 2 hex chars of md5 → 256 buckets.
    * (A string key, deliberately: every engine agrees on md5 hex, while
    * integer-parsing hex is engine-specific.) */
  def bucketOf(feature: Column): Column = substring(md5(feature), 1, 2)

  /** Hashing-trick feature array: v1 tokens + adjacent "a_b" bigrams. */
  def features(text: Column): Column = {
    val toks = Analyzer.tokenize(text)
    val bigrams = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** The deterministic default weight table: bucket `b` (two hex chars)
    * gets the integer weight `(ascii(b[0])·7 + ascii(b[1])·13) % 21 − 10`
    * ∈ [−10, 10]. Stands in for a trained model with the same shape. */
  def hashWeights(spark: SparkSession, buckets: Int = 256): DataFrame = {
    require(buckets >= 1 && buckets <= 256,
      "bucket keys are 2 hex chars: at most 256")
    spark.range(buckets)
      .select(lower(lpad(hex(col("id")), 2, "0")).as("bucket"))
      .select(col("bucket"),
        ((ascii(substring(col("bucket"), 1, 1)) * 7 +
          ascii(substring(col("bucket"), 2, 1)) * 13) % 21 - 10).as("w"))
  }

  /** TRAIN the weight table from (weak) labels — per-bucket Naive-Bayes
    * log-odds with add-one smoothing:
    * `w_b = clamp(round(4·ln( ((pos_b+1)/(totPos+D)) / ((neg_b+1)/(totNeg+D)) )), −10, 10)`
    * where pos_b/neg_b count feature OCCURRENCES hashing to bucket b in
    * positive/negative docs. One explode + two aggregations over the
    * training corpus — distributed closed-form training, no iterations,
    * no driver state beyond the D-row result. Weights land on the same
    * integer scale [[score]] expects, so train → score composes. */
  def trainLogOdds(docs: DataFrame, label: Column,
                   textCol: String = "text",
                   buckets: Int = 256): DataFrame = {
    val feats = docs
      .select(label.cast("boolean").as("y"),
        explode(features(col(textCol))).as("f"))
      .select(col("y"), bucketOf(col("f")).as("bucket"))
    val cnt = feats.groupBy("bucket").agg(
      count(when(col("y"), 1)).cast("double").as("np"),
      count(when(!col("y"), 1)).cast("double").as("nn"))
    val tot = feats.agg(
      count(when(col("y"), 1)).cast("double").as("tp"),
      count(when(!col("y"), 1)).cast("double").as("tn"))
    cnt.crossJoin(broadcast(tot))
      .select(col("bucket"),
        greatest(lit(-10), least(lit(10),
          round(log(((col("np") + 1.0) / (col("tp") + buckets)) /
                    ((col("nn") + 1.0) / (col("tn") + buckets))) * 4.0, 0)
            .cast("int"))).as("w"))
  }

  /** Per-document classifier score over a weight table: explode features,
    * broadcast-join weights on the bucket key, aggregate
    * `sigmoid(sum(w) / (2·n_features))` per doc (features hashing to a
    * bucket absent from the table contribute 0 — fastText's missing-ngram
    * behavior — but still count toward n). Rounded to 4 for cross-engine
    * rank stability. Docs with no features score NULL (no text ≠ bad
    * text). */
  /** RELIABILITY DIAGRAM + ECE (Guo et al. 2017's calibration audit —
    * the check that a quality score's 0.8 actually means 80%): scores
    * bucket into `bins` equal-width bins; per bin the mean predicted
    * probability (confidence), observed positive rate (accuracy), their
    * gap, and the expected calibration error Σ_b n_b·|acc_b − conf_b|/N
    * replicated onto every row.
    *
    * Engine-portability is the design constraint: scores arrive rounded
    * to 4 dp ([[score]]), so s·10⁴ rounds to an exact INTEGER and every
    * aggregate here is an exact integer sum — n_b·|acc_b − conf_b| =
    * |10⁴·y_b − Σs·10⁴|/10⁴, so ECE's numerator is a single exact Long
    * and no float accumulates across rows or bins in EITHER engine
    * (double addition is order-sensitive; integer addition is not). The
    * only floating ops are one final division per output column, floor-
    * form rounded ([[graft.core.Num]]). One groupBy on the bin — the
    * whole audit is a single aggregation pass at any corpus size. */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val s4 = round(col(scoreCol) * 10000).cast("long")
    val per = scored.filter(col(scoreCol).isNotNull)
      .select(
        least(floor(col(scoreCol) * bins).cast("int"), lit(bins - 1))
          .as("bin"),
        s4.as("s4"),
        col(labelCol).cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("s4")).as("ss"),
        sum(col("y")).as("ys"))
      .withColumn("gap_num", abs(col("ys") * 10000L - col("ss")))
    val tot = per.agg(sum(col("n")).as("n_total"),
      sum(col("gap_num")).as("gap_total"))
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        graft.core.Num.roundHalfUp(
          col("ss").cast("double") / (col("n") * 10000.0), 4).as("conf"),
        graft.core.Num.roundHalfUp(
          col("ys").cast("double") / col("n").cast("double"), 4).as("acc"),
        graft.core.Num.roundHalfUp(
          col("gap_num").cast("double") / (col("n") * 10000.0), 4).as("gap"),
        graft.core.Num.roundHalfUp(
          col("gap_total").cast("double") / (col("n_total") * 10000.0), 4)
          .as("ece"))
      .orderBy("bin")
  }

  def score(docs: DataFrame, weights: DataFrame,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats = docs
      .select(col(idCol), explode_outer(features(col(textCol))).as("f"))
      .withColumn("bucket", bucketOf(col("f")))
    feats.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(coalesce(col("w"), lit(0))).as("sw"),
        count(col("f")).as("n"))
      .select(col(idCol),
        when(col("n") > 0,
          round(lit(1.0) / (lit(1.0) +
            exp(-(col("sw").cast("double") / (col("n") * 2.0)))), 4))
          .as("quality"))
  }
}
