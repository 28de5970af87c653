package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-shaping operators for training-data assembly:
  * stratified sampling, epoch shuffling, length-bucketed batching, and
  * preference-pair construction. All randomness is the engine-portable
  * md5 trick (reference seed: the reference's sampling relies on a
  * per-row hash the same way — rand() with a lineage-stable seed; here the
  * hash is content-derived so BOTH engines and EVERY retry land on the
  * same rows, reference core/src/main/scala sampling seeds analogue).
  *
  * Scale posture: every operator is one hash-partitioned pass — the
  * stratified and shuffle rank windows key on the stratum/shard column, so
  * state per task is one partition of one stratum, never a global sort.
  */
object Sampling {

  /** md5-derived sort key: the full 32-hex digest of `id:tag` — fixed
    * width, so STRING order is the 128-bit numeric order in both engines. */
  private def hashKey(id: Column, tag: String): Column =
    md5(concat(id.cast("string"), lit(":" + tag)))

  /** STRATIFIED SAMPLE with per-stratum row targets (the equal-allocation /
    * per-language-quota pass every multilingual mixture runs): within each
    * stratum, rows rank by a deterministic content hash and the first
    * `target` survive; a stratum smaller than its target keeps everything.
    * Unlike Bernoulli sampling ([[graft.queries.Pipeline]]'s
    * q_pipeline_sample_det), the quota is EXACT — rank, not coin-flips.
    *
    * Plan: one row_number window partitioned BY THE STRATUM — Spark runs it
    * as a single hash-partitioned sort with the rank-≤-k filter pushed as
    * WindowGroupLimit, so each task holds one stratum's partition slice,
    * never a global sort. `seed` reshuffles which rows win without
    * touching the plan. */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       targets: Map[String, Long], seed: String,
                       idCol: String = "doc_id"): DataFrame = {
    require(targets.nonEmpty, "no stratum targets")
    val spark = docs.sparkSession
    import spark.implicits._
    val t = broadcast(targets.toSeq.toDF(strataCol, "target"))
    val rk = row_number().over(Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol), seed), col(idCol)))
    docs.join(t, strataCol)
      .withColumn("rk", rk)
      .filter(col("rk") <= col("target"))
      .drop("target")
  }

  /** STRATIFIED K-FOLD assignment (the cross-validation split every
    * trained curation component — classifier thresholds, quality-score
    * calibration — needs before its numbers are trustworthy): within each
    * stratum, rows rank by a deterministic content hash and fold =
    * (rank − 1) mod k — round-robin, so per-stratum fold sizes differ by
    * AT MOST ONE (exact stratification, unlike hash-mod-k's binomial
    * wobble). Same plan shape as [[stratifiedSample]]: one row_number
    * window partitioned by the stratum, no global sort; at extreme
    * per-stratum cardinality the hash-mod assignment (fully parallel,
    * approximately balanced) is the documented fallback. `seed` re-deals
    * the folds without touching the plan. */
  def kfoldAssign(docs: DataFrame, strataCol: String, k: Int, seed: String,
                  idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    docs.withColumn("fold",
      ((row_number().over(Window.partitionBy(col(strataCol))
        .orderBy(hashKey(col(idCol), seed), col(idCol))) - 1) % k)
        .cast("int"))
  }

  /** DETERMINISTIC EPOCH SHUFFLE (the training-order permutation): every
    * row gets a shard and an in-shard position from md5(id:epoch) — a new
    * epoch is a new permutation, and re-running any failed shard
    * reproduces it exactly (no RNG state, no skew from a global sort: the
    * permutation IS the hash partitioning). At 100 TB this is the only
    * shuffle shape that works — one pass, each output shard written by the
    * task that owns its hash range, position assigned by an in-shard sort
    * of constant-width keys. */
  def epochShuffle(docs: DataFrame, epoch: Int, nShards: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val key = hashKey(col(idCol), s"ep$epoch")
    val shard = (conv(substring(key, 1, 4), 16, 10).cast("long") % nShards)
      .cast("int")
    docs.select(col(idCol), key.as("k"), shard.as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("k"), col(idCol))))
      .drop("k")
  }

  /** LENGTH-BUCKETED BATCHING audit: rows split into `nBuckets` equal-size
    * quantile buckets by token count, and per bucket the padding
    * efficiency Σlen / (n · max_len) — the fraction of a padded batch that
    * is real tokens. Bucketing by length is the standard fix for padding
    * waste; the audit quantifies what it buys vs whole-corpus batching.
    *
    * An ntile over the corpus would be ONE global sort partition — the
    * anti-pattern. Instead the global rank decomposes: a cumulative count
    * over the LENGTH HISTOGRAM (|distinct lengths| rows — the only
    * unpartitioned window, histogram-scale) plus an intra-length
    * row_number partitioned by `len`; the ntile bucket is then integer
    * arithmetic on that rank, exact in both engines. */
  def lengthBuckets(docs: DataFrame, nBuckets: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be positive")
    val len = size(graft.fts.Analyzer.tokenize(col(textCol)))
    val lens = docs.select(col(idCol).as("id"), len.cast("long").as("len"))
    val hist = lens.groupBy("len").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("c")).over(Window.orderBy("len")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("len", "cum_before")
    val tot = lens.agg(count(lit(1)).as("n_total"))
    lens.join(broadcast(cum), "len")
      .withColumn("rk", col("cum_before") +
        row_number().over(Window.partitionBy("len").orderBy("id")))
      .crossJoin(broadcast(tot))
      .withColumn("q", expr(s"n_total div ${nBuckets}"))
      .withColumn("r", col("n_total") % nBuckets)
      // classic ntile arithmetic: the first r buckets hold q+1 rows; when
      // q = 0 every rank falls in the first branch, so the q-divisor arm
      // never divides by zero
      .withColumn("bucket", expr(
        """CASE WHEN rk <= (q + 1) * r THEN (rk - 1) div (q + 1) + 1
           ELSE r + (rk - (q + 1) * r - 1) div q + 1 END""").cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("len")).as("min_len"), max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"),
        // rational ratio → floor-form rounding (see core.Num.roundHalfUp:
        // round() flips the last digit across engines on half boundaries)
        graft.core.Num.roundHalfUp(sum(col("len")).cast("double") /
          (count(lit(1)) * max(col("len"))).cast("double"), 4).as("pad_eff"))
      .orderBy("bucket")
  }

  /** CURRICULUM SCHEDULE (Bengio et al. 2009 curriculum learning, the
    * competence-based pacing of Platanios et al. 2019): epoch e may only
    * draw from the easiest `fractions(e)` of the corpus — difficulty is
    * the exact rank of `difficultyCol` (ties on id) — and draws its
    * `budget` deterministically by md5(id:seed:e). Per epoch: the allowed
    * pool size, the draw size, and the drawn difficulty profile.
    *
    * The rank decomposes like [[lengthBuckets]]: a histogram-scale cumsum
    * plus a difficulty-partitioned row_number — no corpus-global window;
    * the per-epoch draw is a rank filter + a TakeOrderedAndProject heap.
    * Epoch count is the driver loop's bound (a handful, by definition). */
  def curriculumSchedule(docs: DataFrame, difficultyCol: String,
                         fractions: Seq[Double], budget: Int, seed: String,
                         idCol: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1.0),
      "fractions in (0, 1]")
    require(budget >= 1, "budget must be positive")
    val lens = docs.select(col(idCol).as("id"),
      col(difficultyCol).cast("long").as("d"))
    val hist = lens.groupBy("d").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("c")).over(Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("d", "cum_before")
    val tot = lens.agg(count(lit(1)).as("n_total"))
    val ranked = lens.join(broadcast(cum), "d")
      .withColumn("rk", col("cum_before") +
        row_number().over(Window.partitionBy("d").orderBy("id")))
      .crossJoin(broadcast(tot))
    val perEpoch = fractions.zipWithIndex.map { case (f, i) =>
      val e = i + 1
      val allowed = ranked.filter(col("rk") <= ceil(col("n_total") * f))
      val drawn = allowed
        .orderBy(md5(concat(col("id").cast("string"),
          lit(s":$seed:$e"))), col("id"))
        .limit(budget)
      drawn.agg(
        count(lit(1)).as("n_drawn"),
        max(col("rk")).as("max_rank"),
        round(avg(col("rk")), 2).as("mean_rank"))
        .crossJoin(broadcast(
          allowed.agg(count(lit(1)).as("n_allowed"))))
        .select(lit(e).as("epoch"), col("n_allowed"), col("n_drawn"),
          col("mean_rank"), col("max_rank"))
    }
    perEpoch.reduce(_ unionByName _).orderBy("epoch")
  }

  /** WEIGHTED SAMPLE WITHOUT REPLACEMENT (Efraimidis & Spirakis 2006,
    * the A-ES "exponential race": key_i = −ln(u_i)/w_i, keep the n
    * SMALLEST keys — equivalent to sequential weighted draws, but each
    * row's key is independent, so the whole draw is one per-row
    * projection + a top-n). The uniform u is the md5 trick, so any
    * engine or retry reproduces the draw; keys round to 9 dp before
    * ranking (libm ln differs in the last ulp across engines) with the
    * id as tiebreak. Plan: TakeOrderedAndProject — a per-partition n-heap,
    * never a global sort. */
  def weightedSample(docs: DataFrame, weightCol: String, n: Int,
                     seed: String, idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, "n must be positive")
    // u = (j+1)/2^24 for the 24-bit md5 prefix j — lands in (0, 1], so
    // the log never sees 0, and every step is exactly representable
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 6), 16, 10).cast("double") + 1.0) /
      (1 << 24).toDouble
    docs
      .withColumn("skey",
        round(-log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("skey"), col(idCol)).limit(n)
  }

  /** PREFERENCE-PAIR construction (the RLHF/DPO data shape): per group,
    * the highest-scoring doc is `chosen` and the lowest `rejected`, kept
    * only when the score gap clears `margin` — a pair whose sides are
    * indistinguishable teaches nothing. Scoring here is whatever column
    * the caller passes (a reward-model score in production; any
    * deterministic quality signal in tests). Ties break on id ascending,
    * making the pair set a pure function of the input.
    *
    * Plan: two rank windows over the same group partitioning — one
    * hash-partitioned sort, group-local state. */
  def preferencePairs(docs: DataFrame, groupCols: Seq[String],
                      scoreCol: String, margin: Long,
                      idCol: String = "doc_id"): DataFrame = {
    require(groupCols.nonEmpty, "no group columns")
    val w = Window.partitionBy(groupCols.map(col): _*)
    val best = row_number().over(w.orderBy(col(scoreCol).desc, col(idCol)))
    val worst = row_number().over(w.orderBy(col(scoreCol).asc, col(idCol)))
    val marked = docs.select(
      (groupCols.map(col) ++ Seq(col(idCol), col(scoreCol))): _*)
      .withColumn("b", best).withColumn("r", worst)
    val chosen = marked.filter(col("b") === 1)
      .select(groupCols.map(col) :+ col(idCol).as("chosen_id")
        :+ col(scoreCol).as("chosen_score"): _*)
    val rejected = marked.filter(col("r") === 1)
      .select(groupCols.map(col) :+ col(idCol).as("rejected_id")
        :+ col(scoreCol).as("rejected_score"): _*)
    chosen.join(rejected, groupCols)
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") - col("rejected_score") >= margin)
      .withColumn("gap", col("chosen_score") - col("rejected_score"))
      .orderBy(groupCols.map(col): _*)
  }
}
