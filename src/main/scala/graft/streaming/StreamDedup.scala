package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Dedup

/** Streaming NEAR-duplicate dedup at ingest — the online half of the
  * pipeline dedup story (`dropDuplicatesWithinWatermark` covers exact ids;
  * this covers content similarity). Each micro-batch:
  *
  *  1. shingle/minhash signatures for the batch's docs (native kernels);
  *  2. candidates against the persisted signature STORE of all previously
  *     ingested docs — an equi-join on (band, band-hash), so a new doc
  *     meets only the historical docs in its LSH buckets, never the whole
  *     store;
  *  3. candidates within the batch (the usual banded self-join);
  *  4. exact-Jaccard verify on candidates only — the historical side's
  *     shingle sets are read PRUNED to the candidate aids' store partitions
  *     (`store_sets` is partitioned by doc_id mod [[SetBuckets]]), so the
  *     verify touches O(candidates) of the store, never O(corpus); a doc
  *     with a verified near-dup among earlier docs (prior batches, or
  *     smaller id in its own batch) is dropped;
  *  5. the batch's signatures append to the store (kept AND dropped docs —
  *     the drop rule is "dominated by ANY earlier doc", which keeps the
  *     rule deterministic and batch-order-insensitive), survivors append to
  *     the kept log.
  *
  * Store size grows with the corpus, not the duplicate rate — (doc_id,
  * shingle hashes) + 16 band rows per doc, i.e. the same signature table a
  * batch dedup would materialize, paid incrementally. Exactly-once comes
  * from the checkpointed offsets; appends are idempotent per batch only if
  * the batch is not replayed, which the offset WAL guarantees.
  */
object StreamDedup {

  /** Bucket count of the band store — writer and re-register DDL agree. */
  private val StoreBuckets = 16

  /** Partition count of the signature-set store: `store_sets` is laid out
    * as `sbucket = doc_id mod SetBuckets` parquet partitions, so a batch's
    * verify stage reads ONLY its candidate aids' partitions (partition
    * filter) and, inside them, pushes the aid set into the parquet scan —
    * never a store-wide read. 16 matches the fixture scale; at cluster
    * scale use O(thousands) so a batch's candidates touch a small fraction
    * of the partitions. */
  private val SetBuckets = 16

  /** Hot-band skew guard: up to this many distinct candidate aids are
    * collected to the driver and pushed into the store_sets parquet scan
    * as an id filter. Above it (a degenerate corpus — e.g. boilerplate
    * docs piling into one (band, bh) bucket makes store collisions
    * O(store), so the candidate set genuinely grows with the corpus) the
    * driver never sees ids at all: only the distinct `sbucket` partition
    * values are collected — bounded by [[SetBuckets]], never by the
    * corpus — and per-id filtering happens in the distributed verify
    * join. The FTS df-cap (fts/Fts.scala) bounds the same shape on the
    * query side; here recall must stay exact, so the guard changes the
    * execution strategy, not the candidate set. */
  private[streaming] val AidPushdownCap = 10000L

  /** Driver-side mirror of the `sbucket` write expression. */
  private def setBucket(id: Long): Long =
    java.lang.Math.floorMod(id, SetBuckets.toLong)

  /** Catalog name for `dir`'s band store (deterministic per state dir, so a
    * restarted stream finds its own table and two streams don't collide). */
  private[streaming] def storeTableName(dir: String): String =
    "graft_sd_store_" + java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))

  /** Start the ingest-dedup sink over `docsStream`; state and outputs live
    * under `dir` (`store_sets`, `store_bands`, `kept`, `_checkpoint`). */
  def start(docsStream: DataFrame, dir: String,
            threshold: Double = 0.8): StreamingQuery = {
    // a previous run over the same dir may have been wiped on disk — drop
    // the then-dangling catalog entry so the store restarts empty
    val spark = docsStream.sparkSession
    val name = storeTableName(dir)
    if (spark.catalog.tableExists(name)) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/store_bands")
      if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        spark.sql(s"DROP TABLE $name")
    }
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch, dir, threshold)
      }
      .start()
  }

  private def emptyLike(spark: SparkSession, like: DataFrame): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), like.schema)

  /** The candidate aids' shingle sets from the partitioned store — a
    * PRUNED read: the aid set restricts the scan to its `sbucket`
    * partitions (partition filter — unmatched partitions are never read)
    * and pushes into the parquet row groups inside them. The per-batch
    * verify therefore touches O(candidates) of the store, not O(corpus):
    * the fix for the r5 store-wide `store_sets` scan. */
  private[streaming] def prunedStoreSets(spark: SparkSession, dir: String,
                                         aids: Array[Long],
                                         like: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/store_sets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (aids.isEmpty || !fs.exists(p)) emptyLike(spark, like)
    else spark.read.parquet(s"$dir/store_sets")
      .filter(col("sbucket").isin(aids.map(setBucket).distinct.toSeq: _*) &&
        col("doc_id").isin(aids.toSeq: _*))
      .select("doc_id", "hs")
  }

  /** The candidate-partition store read for the HOT-BAND fallback: pruned
    * by `sbucket` partition values only (≤ [[SetBuckets]] of them), no
    * per-id pushdown — the distributed verify join does the id filtering.
    * Used when the candidate set is too large to collect ids. */
  private[streaming] def storeSetsByBuckets(spark: SparkSession, dir: String,
                                            buckets: Array[Long],
                                            like: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/store_sets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (buckets.isEmpty || !fs.exists(p)) emptyLike(spark, like)
    else spark.read.parquet(s"$dir/store_sets")
      .filter(col("sbucket").isin(buckets.toSeq: _*))
      .select("doc_id", "hs")
  }

  /** Store-side shingle sets for the cross-batch verify, with the skew
    * guard: ≤ [[AidPushdownCap]] candidates → collect the distinct aid set
    * (the only driver-side materialization in the batch, bounded by the
    * cap) and read the store pruned by partition AND id; above the cap →
    * collect only the distinct partition buckets (≤ [[SetBuckets]] values
    * regardless of corpus size) and keep all per-id work distributed. */
  private[streaming] def storeSetsForVerify(spark: SparkSession, dir: String,
                                            crossCands: DataFrame, nCand: Long,
                                            like: DataFrame): DataFrame =
    if (nCand <= AidPushdownCap) {
      val aids = crossCands.select("aid").distinct().collect().map(_.getLong(0))
      prunedStoreSets(spark, dir, aids, like)
    } else {
      val buckets = crossCands
        .select(pmod(col("aid"), lit(SetBuckets.toLong)).as("sb"))
        .distinct().collect().map(_.getLong(0))
      storeSetsByBuckets(spark, dir, buckets, like)
    }

  /** The band store, read as a BUCKETED catalog table on the join key
    * (band, bh). Bucketing is what keeps the per-batch candidate join
    * O(batch): the ever-growing store is read co-located in its buckets —
    * no Exchange on the store side — and only the new batch's bands shuffle
    * into the store's bucketing (the q_join_bucketed layout applied to
    * streaming state; plain appended parquet re-shuffled the WHOLE store
    * every micro-batch). A resume whose catalog lost the entry (fresh
    * session over surviving files) re-registers the same bucketed DDL. */
  private[streaming] def readStoreBands(spark: SparkSession, dir: String,
                             like: DataFrame): DataFrame = {
    val name = storeTableName(dir)
    val path = s"$dir/store_bands"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!spark.catalog.tableExists(name) && fs.exists(p)) {
      // Store-layout guard (first open of surviving files): the files'
      // OWN footer schema must carry the v2 size column `n`. Re-creating
      // the catalog table from the v2 batch schema over v1 files would
      // read `n` as NULL, and the size-prune join predicate in
      // [[dedupBatch]] would silently drop every historical candidate —
      // cross-batch dedup would stop detecting duplicates against
      // pre-upgrade documents instead of failing. Fail loud, as the
      // layout-v2 docstring promises.
      if (!spark.read.parquet(path).schema.fieldNames.contains("n"))
        throw new IllegalStateException(
          s"graft band store at $path is layout v1 (no shingle-set size " +
            "column 'n'); this version cannot read it — rebuild the store " +
            "by re-ingesting (it is derived state, never the source of truth)")
      val cols = like.schema
        .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      spark.sql(s"""CREATE TABLE $name ($cols) USING parquet
        CLUSTERED BY (band, bh) SORTED BY (band, bh)
        INTO $StoreBuckets BUCKETS LOCATION '$path'""")
    }
    if (spark.catalog.tableExists(name))
      spark.table(name).select(like.columns.map(col): _*)
    else emptyLike(spark, like)
  }

  /** Store layout v2: band rows carry the doc's shingle-set size `n` (from
    * [[Dedup.bandKeys]]) so the candidate join can size-prune in place; a
    * v1 store (no `n`) is not readable by this version — rebuild it by
    * re-ingesting (the store is derived state, never the source of truth). */
  private def appendStoreBands(bands: DataFrame, dir: String): Unit =
    bands.write.mode(SaveMode.Append)
      .option("path", s"$dir/store_bands")
      .bucketBy(StoreBuckets, "band", "bh").sortBy("band", "bh")
      .saveAsTable(storeTableName(dir))

  /** Fold the stores' per-batch file fragments: every micro-batch appends
    * one file per touched bucket/partition, so after N batches each
    * partition holds N small files — the same unbounded-fragment story the
    * FTS delta log solves with epochs, solved here by an offline rewrite
    * (run it between ingests, like any OPTIMIZE). `store_sets` partitions
    * and the bucketed `store_bands` table are each rewritten to one file
    * per partition/bucket via a staged directory swap (bucket ids live in
    * the file NAMES, which a directory rename preserves). Quiesce the
    * stream first — single-writer, like the index compaction. */
  def compactStore(spark: SparkSession, dir: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    // crash-ordered swap: the live directory is renamed ASIDE before the
    // compacted one renames in, so every crash window leaves a complete
    // copy on disk (`dst` or `dst_old`) — delete-then-rename had a window
    // where a crash lost the store entirely, with no recovery path
    def swap(tmp: String, dst: String): Unit = {
      val dstP = new org.apache.hadoop.fs.Path(dst)
      val oldP = new org.apache.hadoop.fs.Path(dst + "_old")
      fs.delete(oldP, true) // leftover from a previous crashed swap
      if (fs.exists(dstP)) fs.rename(dstP, oldP)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), dstP)
      fs.delete(oldP, true)
    }
    val setsPath = s"$dir/store_sets"
    if (fs.exists(new org.apache.hadoop.fs.Path(setsPath))) {
      val tmp = s"$dir/store_sets_compacting"
      spark.read.parquet(setsPath)
        .repartition(col("sbucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("sbucket").parquet(tmp)
      swap(tmp, setsPath)
    }
    val name = storeTableName(dir)
    // a fresh session over surviving files: re-register before compacting
    if (!spark.catalog.tableExists(name) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/store_bands")))
      readStoreBands(spark, dir, spark.read.parquet(s"$dir/store_bands"))
    if (spark.catalog.tableExists(name)) {
      val tmpName = name + "_compacting"
      val tmpPath = s"$dir/store_bands_compacting"
      spark.sql(s"DROP TABLE IF EXISTS $tmpName")
      fs.delete(new org.apache.hadoop.fs.Path(tmpPath), true)
      spark.table(name)
        // one task per bucket → one file per bucket (repartition hashing
        // matches the bucketing's Murmur3 on the same columns)
        .repartition(StoreBuckets, col("band"), col("bh"))
        .write
        .option("path", tmpPath)
        .bucketBy(StoreBuckets, "band", "bh").sortBy("band", "bh")
        .saveAsTable(tmpName)
      spark.sql(s"DROP TABLE $name") // external: files survive the drop
      swap(tmpPath, s"$dir/store_bands")
      spark.sql(s"DROP TABLE $tmpName")
      // re-register the canonical DDL over the swapped files: the next
      // batch's readStoreBands would do the same, done here so a live
      // session can keep querying the store
      val like = spark.read.parquet(s"$dir/store_bands")
      readStoreBands(spark, dir, like)
    }
  }

  /** SPARK_GRAFT_TRACE=1: per-stage wall times on stderr — scale-profiling
    * aid for the lifecycle spot tools, zero cost when unset. */
  private val trace = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
  private def traced[T](label: String)(body: => T): T =
    if (!trace) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[graft.trace] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

  private def dedupBatch(batch: DataFrame, dir: String, threshold: Double): Unit = {
    val spark = batch.sparkSession
    val sets = traced("shingleSets")(Dedup.shingleSets(batch)) // persisted + counted inside
    val bands = Dedup.bandKeys(sets).persist()
    traced("bandKeys")(bands.count())
    // historical candidates: stored doc (aid, earlier by construction) ×
    // new doc (bid) meeting in an LSH bucket — the store side reads
    // co-located in its buckets, only the batch's bands shuffle. Band rows
    // carry the shingle-set size (store layout v2), so the exact
    // size-ratio prune (J ≥ t needs min/max sizes ≥ t — can never drop a
    // verifiable pair) kills hot-bucket collision pairs while they are
    // generated, before the distinct or any store-set read sees them.
    val crossCands = readStoreBands(spark, dir, bands).as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.n") >= lit(threshold) * col("b.n") &&
          col("b.n") >= lit(threshold) * col("a.n"))
      .select(col("a.doc_id").as("aid"), col("b.doc_id").as("bid"))
      .distinct()
      .persist() // feeds the count, the aid/bucket pruning, AND the verify
    try {
      // the candidate PAIRS never land on the driver — they stay a
      // distributed frame through the verify join. The driver sees at most
      // the distinct aid set (≤ AidPushdownCap, for parquet id pushdown)
      // or, on a hot band where candidates grow with the store, just the
      // distinct partition buckets (≤ SetBuckets): see storeSetsForVerify.
      val nCand = traced("crossCands")(crossCands.count())
      if (trace) System.err.println(s"[graft.trace] nCand=$nCand")
      // verify needs both sides' shingle sets: aid from the store — read
      // PRUNED to the candidates' partitions — bid from the new batch
      val crossDropped =
        if (nCand == 0L)
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType))))
        else Dedup.verifyJaccard(
            crossCands,
            storeSetsForVerify(spark, dir, crossCands, nCand, sets)
              .unionByName(sets),
            threshold)
          .select(col("bid").as("doc_id"))
      // within-batch: smaller id wins, same verify — over the band rows
      // already materialized above (no second minhash pass)
      val batchCands = Dedup.minhashCandidatesFromBands(bands, threshold)
      if (trace) traced("batchCands") {
        System.err.println(s"[graft.trace] nBatchCand=${batchCands.count()}")
      }
      val batchDropped = Dedup.verifyJaccard(batchCands, sets, threshold)
        .select(col("bid").as("doc_id"))

      val dropped = crossDropped.union(batchDropped).distinct()
      traced("verify+kept") {
        batch.join(dropped, Seq("doc_id"), "left_anti")
          .write.mode(SaveMode.Append).parquet(s"$dir/kept")
      }
      // ALL signatures enter the store (drop rule: dominated by any
      // earlier doc, kept or not), partitioned for the pruned verify read.
      // Repartition ON the partition column first: each partition dir is
      // then written by exactly one task (16 files per batch, not
      // tasks × partitions file fragments).
      traced("storeSetsWrite") {
        sets.withColumn("sbucket", pmod(col("doc_id"), lit(SetBuckets.toLong)))
          .repartition(col("sbucket"))
          .write.mode(SaveMode.Append).partitionBy("sbucket")
          .parquet(s"$dir/store_sets")
      }
      traced("storeBandsWrite")(appendStoreBands(bands, dir))
    } finally {
      crossCands.unpersist()
      bands.unpersist()
      sets.unpersist()
    }
  }
}
