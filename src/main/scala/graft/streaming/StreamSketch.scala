package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming sketch maintenance: the count-min grid ([[graft.ops.Cms]]) is
  * MERGEABLE — counter addition — which is the property that makes
  * sketches the scale tool: every executor (here, every micro-batch)
  * sketches its slice independently and the grids ADD.
  *
  * EXACTLY-ONCE UNDER REPLAY: each micro-batch writes ONLY its own
  * deterministic delta to `store/bid=<batchId>/`, and the running state
  * is the merge-on-read of all deltas. Structured Streaming replays a
  * batch (same batchId, same input) after a crash between the sink write
  * and the checkpoint commit; here the replay overwrites its own `bid`
  * dir with bit-identical content and touches no other batch's data — a
  * no-op, unlike a read-fold-overwrite of a single store (which would
  * double-add the batch AND can lose the whole store to a crash
  * mid-overwrite). Merge cost is ≤ d·w rows per batch (CMS) / ≤ n rows
  * per batch (reservoir); long-lived streams bound the file count with
  * the crash-safe [[compact]]. */
object StreamSketch {

  /** Ingest `stream` and maintain the additive CMS store at `store`.
    * Each micro-batch sketches the BATCH only (one explode+groupBy, grid
    * ≤ d·w rows) and lands it as the batch's own delta dir. */
  def start(stream: DataFrame, keyCol: String, store: String,
            d: Int, w: Int): StreamingQuery = {
    require(d.toLong * w <= (1 << 20), s"sketch grid ${d}x$w too large to fold on the driver")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        graft.ops.Cms.sketch(batch, keyCol, d, w)
          .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=$bid")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()
  }

  /** The merged CMS grid: counter addition over the newest base (if a
    * compaction ran) plus every delta it does not cover. */
  def read(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(livePaths(spark, store): _*)
      .groupBy("r", "pos").agg(sum(col("cnt")).as("cnt"))

  /** STREAMING WEIGHTED RESERVOIR (Efraimidis & Spirakis A-ES is *the*
    * one-pass weighted sampler — the key −ln(u)/w is per-row state, so
    * "keep the n smallest keys" merges across batches exactly like the
    * CMS grid adds): each micro-batch lands its rows' n smallest keys as
    * its own delta (a valid pre-prune: the global n smallest over the
    * union is contained in the per-batch n smallest), and the reservoir
    * is the n smallest over all deltas at read time. Deterministic keys
    * (md5 construction, [[graft.pipeline.Sampling.weightedSample]]) make
    * the replayed delta bit-identical, so restart cannot duplicate ids. */
  def startWeightedReservoir(stream: DataFrame, idCol: String,
                             weightCol: String, seed: String, n: Int,
                             store: String): StreamingQuery = {
    require(n >= 1 && n <= (1 << 20), "reservoir size out of driver range")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val u = (conv(substring(md5(concat(col(idCol).cast("string"),
          lit(":" + seed))), 1, 6), 16, 10).cast("double") + 1.0) /
          (1 << 24).toDouble
        batch.select(col(idCol).as("rid"),
            round(-log(u) / col(weightCol).cast("double"), 9).as("skey"))
          .orderBy(col("skey"), col("rid")).limit(n)
          .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=$bid")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()
  }

  /** The merged reservoir: n smallest keys over base + uncovered deltas
    * (a base produced by [[compactReservoir]] is itself a valid delta —
    * min-n is associative exactly like counter addition). */
  def readReservoir(spark: SparkSession, store: String, n: Int): DataFrame =
    spark.read.parquet(livePaths(spark, store): _*)
      .select("rid", "skey")
      .orderBy(col("skey"), col("rid")).limit(n)

  /** CRASH-SAFE COMPACTION for long-lived streams: fold every live part
    * with bid ≤ `upto` into `store/base_upto=<upto>` — a deterministic
    * function of fixed inputs, so a raced or replayed compaction rewrites
    * the same bytes — then GC the covered dirs. The base lives OUTSIDE
    * the `bid=` namespace and [[livePaths]] ignores everything the newest
    * base covers, so a crash between the base landing and the GC leaves
    * redundant-but-ignored dirs, never a double count. Call between
    * triggers (the stream itself only ever appends new `bid` dirs). */
  def compact(spark: SparkSession, store: String, upto: Long): Unit =
    compactWith(spark, store, upto,
      _.groupBy("r", "pos").agg(sum(col("cnt")).as("cnt")))

  /** Reservoir analogue of [[compact]]: the fold keeps the n smallest. */
  def compactReservoir(spark: SparkSession, store: String, upto: Long,
                       n: Int): Unit =
    compactWith(spark, store, upto,
      _.select("rid", "skey").orderBy(col("skey"), col("rid")).limit(n))

  private def compactWith(spark: SparkSession, store: String, upto: Long,
                          fold: DataFrame => DataFrame): Unit = {
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$store/base_upto=$upto")
    val covered = listParts(spark, store)
      .filter { case (bid, _, isBase) => bid <= upto && !isBase }
      .map(_._2)
    val staleBases = listParts(spark, store)
      .filter { case (bid, _, isBase) => isBase && bid < upto }.map(_._2)
    if (!fs.exists(target)) {
      val live = livePaths(spark, store).filter { p =>
        val (bid, _, _) = parsePart(new Path(p)).get
        bid <= upto
      }
      if (live.isEmpty) return
      fold(spark.read.parquet(live: _*))
        .coalesce(1).write.mode("overwrite").parquet(target.toString)
    }
    (covered ++ staleBases).foreach(p => fs.delete(p, true))
  }

  /** (coverage bid, path, isBase) for every part dir under the store. */
  private def listParts(spark: SparkSession,
                        store: String): Seq[(Long, Path, Boolean)] = {
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toIndexedSeq.map(_.getPath)
      .flatMap(p => parsePart(p))
  }

  private def parsePart(p: Path): Option[(Long, Path, Boolean)] =
    if (p.getName.startsWith("bid="))
      Some((p.getName.stripPrefix("bid=").toLong, p, false))
    else if (p.getName.startsWith("base_upto="))
      Some((p.getName.stripPrefix("base_upto=").toLong, p, true))
    else None

  /** The newest base (if any) plus every delta it does not cover. Leaf
    * dirs are read by explicit path, so the `bid=`/`base_upto=` names
    * never become partition columns. */
  private def livePaths(spark: SparkSession, store: String): Seq[String] = {
    val parts = listParts(spark, store)
    val newestBase = parts.filter(_._3).sortBy(_._1).lastOption
    val floor = newestBase.map(_._1).getOrElse(Long.MinValue)
    (newestBase.map(_._2) ++
      parts.filter { case (bid, _, isBase) => !isBase && bid > floor }
        .map(_._2)).map(_.toString).toIndexedSeq
  }
}
