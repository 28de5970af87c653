package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the data-loader step that turns a curated corpus into
  * fixed token-budget training bins: documents in a deterministic global
  * order, each assigned to bin ⌊exclusive-prefix-sum / budget⌋.
  *
  * The naive formulation is `sum(toks) OVER (ORDER BY doc_id)` — an
  * un-partitioned window, i.e. a SINGLE-partition sort of the whole corpus
  * (Spark plans it as one task; a 100 TB input dies there). This
  * implementation is the distributed two-level prefix sum instead:
  *
  *  1. range-repartition by doc_id (partition i holds a contiguous id range,
  *     ranges ascending with partition id — RangePartitioner's contract);
  *  2. per-partition local cumulative sums (window PARTITIONED by the range
  *     partition — parallel, bounded state);
  *  3. per-partition totals → exclusive offsets: a #partitions-row frame, the
  *     only place a global window runs (trivially small), broadcast back.
  *
  * Total cost: one range shuffle + one broadcast — same shape at any scale.
  */
object Packing {

  /** Per-bin packing summary at `budget` tokens per bin (tokens =
    * [[TextStats.estBpeTokens]]): bin id, docs, token total, id range. A
    * document that straddles a boundary belongs to the bin where it STARTS
    * (exclusive prefix sum), so bins can overflow by at most one document —
    * the standard pre-tokenization packing contract (exact packing happens
    * after real tokenization, inside the loader).
    *
    * The local cumsum deliberately runs as an in-partition `mapPartitions`
    * pass, NOT a `Window.partitionBy(pid)` — RangePartitioning(doc_id)
    * cannot satisfy a window's ClusteredDistribution(pid), so the window
    * formulation re-shuffles the whole corpus a second time (hash on pid,
    * with balls-in-bins skew to boot). The pass is linear, ordered by the
    * in-partition sort, and keeps the data path at exactly ONE shuffle. */
  def packByBudget(docs: DataFrame, budget: Long, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive") // div 0 → silent NULL bins
    val spark = docs.sparkSession
    import spark.implicits._
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val local = docs
      .select(col(idCol).as("doc_id"),
        TextStats.estBpeTokens(col(textCol)).as("toks"))
      .repartitionByRange(nPart, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var cum = 0L
        it.map { case (id, t) => cum += t; (pid, id, t, cum) }
      }
      .toDF("pid", "doc_id", "toks", "lcum")
      .persist()
    local.count() // materialize once; scanned by offsets + final join
    val offsets = local.groupBy("pid").agg(sum(col("toks")).as("psum"))
      .withColumn("offset",
        coalesce(sum(col("psum")).over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), "pid")
      .withColumn("start", col("lcum") + col("offset") - col("toks"))
      .withColumn("bin", expr(s"start div $budget"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }
}
