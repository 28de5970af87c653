package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing — the source-weighting step that turns curated data into
  * a training mixture: each source contributes documents until its token
  * budget (weight × total) is reached, in a DETERMINISTIC pseudo-random
  * order (md5 of the id — engine-reproducible, so a re-run, a retry, or
  * another engine selects the identical subset; an RNG would not survive
  * any of those).
  *
  * This is [[Packing]]'s distributed prefix sum generalized from one
  * global order to PER-SOURCE orders: the naive form is
  * `sum(toks) OVER (PARTITION BY source ORDER BY h)` — and a 100 TB
  * corpus has few sources, so per-source windows are a handful of
  * single-task sorts over corpus-sized partitions. Instead:
  *
  *  1. range-repartition by (source, h, id) — contiguous slices, a
  *     source's slices ascending with partition id;
  *  2. per-partition linear pass computing the local cumsum, RESET at
  *     each source change (one source's data never meets another's);
  *  3. per-(partition, source) totals → exclusive offsets via a window
  *     over that tiny frame (≤ partitions + sources rows — the only
  *     global window), broadcast back.
  *
  * The doubled scan of the ranged data reuses the SAME shuffle files
  * (Spark re-runs only the linear local pass), so the data path is one
  * range shuffle + one broadcast at any scale — no cache of a
  * corpus-sized frame. */
object Mixing {

  /** TEMPERATURE-weighted per-source budgets — the mT5/XLM-R alpha-
    * sampling step that turns raw source sizes into training-mixture
    * weights: w_s ∝ n_s^alpha (alpha < 1 UP-samples small sources,
    * alpha = 1 is proportional, alpha = 0 uniform), budget_s =
    * ⌊total · w_s / Σw⌋. Feeds [[mixByBudget]] unchanged.
    *
    * Distributed part: ONE aggregation to (source, token_count) —
    * |sources|-rows, collected (a 100 TB corpus has few sources; this is
    * the same driver-resident budget map mixByBudget already takes).
    * Determinism across engines: pow is transcendental, so the weight is
    * ROUNDED to 4 dp and integer-scaled before any division — the
    * remaining arithmetic is exact BIGINT (a float Σw would differ by
    * summation order between engines and flip a ⌊·⌋ boundary). */
  def temperatureBudgets(docs: DataFrame, totalBudget: Long, alpha: Double,
                         textCol: String = "text",
                         sourceCol: String = "source"): Map[String, Long] =
    temperatureBudgetsCounted(docs.select(col(sourceCol),
        TextStats.estBpeTokens(col(textCol)).as("toks")),
      totalBudget, alpha, sourceCol)

  /** [[temperatureBudgets]] over an EXPLICIT per-doc token-count frame
    * `(sourceCol, toksCol)` — the real-tokenizer path: feed it
    * [[Bpe.countTokens]] output (joined to sources) so budgets are
    * measured in the same units the training run consumes. The default
    * overload's [[TextStats.estBpeTokens]] is the estimator FALLBACK for
    * when no trained tokenizer exists yet. */
  def temperatureBudgetsCounted(perDoc: DataFrame, totalBudget: Long,
                                alpha: Double,
                                sourceCol: String = "source",
                                toksCol: String = "toks"): Map[String, Long] = {
    require(totalBudget >= 0 && alpha >= 0.0, "need totalBudget, alpha >= 0")
    val counts = perDoc
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(col(toksCol)).cast("bigint").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // integer-scaled 4-dp weights: w4 = round(n^alpha, 4dp) * 10^4
    val w4 = counts.map { case (s, n) =>
      s -> math.round(math.pow(n.toDouble, alpha) * 10000.0)
    }
    val sw = w4.map(w => BigInt(w._2)).sum
    // product in BigInt: totalBudget ~ 1e12-1e13 tokens at 100 TB and
    // w4 can reach ~1e16, so the Long product overflows — the quotient
    // is always <= totalBudget and fits back in a Long.
    if (sw == 0) w4.map { case (s, _) => s -> 0L }.toMap
    else w4.map { case (s, w) => s -> (BigInt(totalBudget) * w / sw).toLong }.toMap
  }

  /** Repeat-capped temperature budgets — the data-constrained regime
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language Models",
    * arXiv:2305.16264: repeating data beyond ~4 epochs stops helping): no
    * source may be budgeted more than `maxEpochs` passes over its own
    * tokens, and the tokens a capped source gives up are redistributed
    * proportionally among the uncapped ones. */
  def temperatureBudgetsCapped(docs: DataFrame, totalBudget: Long,
                               alpha: Double, maxEpochs: Double = 4.0,
                               textCol: String = "text",
                               sourceCol: String = "source"): Map[String, Long] =
    temperatureBudgetsCappedCounted(docs.select(col(sourceCol),
        TextStats.estBpeTokens(col(textCol)).as("toks")),
      totalBudget, alpha, maxEpochs, sourceCol)

  /** [[temperatureBudgetsCapped]] over an explicit `(sourceCol, toksCol)`
    * per-doc count frame (the [[Bpe.countTokens]] real-tokenizer path).
    *
    * EXACT waterfilling, no iteration: order sources by cap/weight — the
    * order caps bind as the uncapped scale factor grows — then the capped
    * set is a prefix of that order (standard waterfill argument: if source
    * i's cap exceeds its share at i's step, every later source's does
    * too). Source i is capped iff cap_i · SW_i < (B − CC_{i−1}) · w_i,
    * with CC = cumulative caps before i and SW = Σ weights from i on.
    * ALL comparisons — the prefix condition AND the sort itself — are
    * exact BigInt cross-multiplications (cap_a·w_b vs cap_b·w_a; tie:
    * source name), no float ratio and no quantized key anywhere, so an
    * SQL oracle replays every boundary exactly at any magnitude (budgets
    * ~1e13 × weights ~1e17 overflow Long products; 128-bit HUGEINT
    * products replay the comparator). A quantized key (r12 used
    * ⌊cap·10¹²/w⌋) could order two sources whose true ratios differ
    * within the quantization AGAINST ratio order, letting the prefix loop
    * stop early and hand a capped source a share above its cap — the
    * exact comparator is what makes the 'never exceeds its cap' contract
    * unconditional. An uncapped source's
    * ⌊(B−CC*)·w/SW*⌋ never exceeds its cap (that's the prefix condition),
    * and if EVERY source caps the mixture under-fills: Σ budgets =
    * Σ caps < total — you cannot buy more than maxEpochs × the data you
    * have. */
  def temperatureBudgetsCappedCounted(perDoc: DataFrame, totalBudget: Long,
                                      alpha: Double, maxEpochs: Double,
                                      sourceCol: String = "source",
                                      toksCol: String = "toks"): Map[String, Long] = {
    require(totalBudget >= 0 && alpha >= 0.0 && maxEpochs > 0.0,
      "need totalBudget, alpha >= 0 and maxEpochs > 0")
    val counts = perDoc
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(col(toksCol)).cast("bigint").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val m4 = math.round(maxEpochs * 10000.0)
    val rows = counts.map { case (s, n) =>
      (s, math.round(math.pow(n.toDouble, alpha) * 10000.0),
        (BigInt(n) * m4 / 10000).toLong)
    }
    val (zero, pos) = rows.partition(_._2 <= 0)
    val ordered = pos.sortWith { case ((sa, wa, ca), (sb, wb, cb)) =>
      val c = (BigInt(ca) * wb).compare(BigInt(cb) * wa)
      if (c != 0) c < 0 else sa < sb
    }
    val B = BigInt(totalBudget)
    var ccPrev = BigInt(0)
    var swFrom = ordered.iterator.map(r => BigInt(r._2)).sum
    var i = 0
    val capped = Map.newBuilder[String, Long]
    while (i < ordered.length &&
        BigInt(ordered(i)._3) * swFrom < (B - ccPrev) * ordered(i)._2) {
      val (s, w, cap) = ordered(i)
      capped += s -> cap
      ccPrev += cap
      swFrom -= w
      i += 1
    }
    val free = ordered.drop(i).map { case (s, w, _) =>
      s -> (if (swFrom == 0) 0L else ((B - ccPrev) * w / swFrom).toLong)
    }
    (zero.map(z => z._1 -> 0L) ++ free).toMap ++ capped.result()
  }

  /** Documents selected for the mixture: `(doc_id, source, toks)` — per
    * source, the md5-ordered prefix whose token count STARTS inside that
    * source's budget (exclusive prefix sum, so a straddling document is
    * kept and a source can overflow by at most one document — the
    * [[Packing]] contract). Sources absent from `budgets` are dropped;
    * a zero budget keeps nothing; tokens are [[TextStats.estBpeTokens]]. */
  def mixByBudget(docs: DataFrame, budgets: Map[String, Long],
                  idCol: String = "doc_id", textCol: String = "text",
                  sourceCol: String = "source"): DataFrame =
    mixByBudgetCounted(docs.select(col(idCol), col(sourceCol),
        TextStats.estBpeTokens(col(textCol)).as("toks")),
      budgets, idCol, sourceCol)

  /** [[mixByBudget]] over an EXPLICIT per-doc token-count frame
    * `(idCol, sourceCol, toksCol)` — pair with
    * [[temperatureBudgetsCounted]] so selection and budgets use the same
    * token units (real BPE via [[Bpe.countTokens]], or any other
    * counter); the text-column overload's estimator is the fallback. */
  def mixByBudgetCounted(perDoc: DataFrame, budgets: Map[String, Long],
                         idCol: String = "doc_id",
                         sourceCol: String = "source",
                         toksCol: String = "toks"): DataFrame = {
    require(budgets.nonEmpty, "empty budget map selects nothing")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val spark = perDoc.sparkSession
    import spark.implicits._
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val local = perDoc
      .select(col(sourceCol).cast("string").as("source"),
        substring(md5(col(idCol).cast("string")), 1, 8).as("h"),
        col(idCol).cast("long").as("doc_id"),
        col(toksCol).cast("long").as("toks"))
      .where(col("source").isin(budgets.keys.toSeq: _*))
      .repartitionByRange(nPart, col("source"), col("h"), col("doc_id"))
      .sortWithinPartitions("source", "h", "doc_id")
      .as[(String, String, Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var cur: String = null
        var cum = 0L
        it.map { case (src, h, id, t) =>
          if (src != cur) { cur = src; cum = 0L }
          cum += t
          (pid, src, id, t, cum)
        }
      }
      .toDF("pid", "source", "doc_id", "toks", "lcum")
    val offsets = local.groupBy("pid", "source").agg(sum(col("toks")).as("psum"))
      .withColumn("offset",
        coalesce(sum(col("psum")).over(Window.partitionBy("source").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "source", "offset")
    val budgetDf = budgets.toSeq.toDF("source", "budget")
    local.join(broadcast(offsets), Seq("pid", "source"))
      .join(broadcast(budgetDf), "source")
      .where(col("lcum") + col("offset") - col("toks") < col("budget"))
      .select("doc_id", "source", "toks")
  }
}
