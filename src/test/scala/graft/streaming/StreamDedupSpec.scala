package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming near-dup dedup: batches arrive in id order; a doc must be
  * dropped when its near-dup lives in a PRIOR batch (store path), in its
  * own batch (self-join path), and never for sub-threshold similarity. */
class StreamDedupSpec extends SparkSpec {

  test("drops cross-batch and in-batch near-dups, keeps distinct docs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val other = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 3
    val batch0 = Seq(
      (1L, base),                    // kept (first)
      (2L, base + " tailword"),      // near-dup of 1, SAME batch → dropped
      (3L, other))                   // kept
    val batch1 = Seq(
      (10L, base + " othertail"),    // near-dup of 1, PRIOR batch → dropped
      (11L, "completely different text about spark queries and engines running fast"))
    val root = graft.core.Scratch.dir("stream_neardup_spec")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val landing = s"$root/landing"
    def stage(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val stageDir = s"$root/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stageDir)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
      val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
      fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
      fs.setTimes(dst, mtime, -1)
    }
    stage(batch0, "b0", 1700000000000L)
    stage(batch1, "b1", 1700000060000L)

    val schema = spark.read.parquet(s"$landing/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    StreamDedup.start(stream, root).awaitTermination()

    val kept = spark.read.parquet(s"$root/kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 11L),
      s"expected cross-batch drop of 10 and in-batch drop of 2, got $kept")
    // the store accumulated signatures for ALL five docs
    assert(spark.read.parquet(s"$root/store_sets").count() == 5)

    // THE scale property: the band store is a bucketed table on the join
    // key, so a batch's candidate join reads the store co-located — the
    // only Exchange is the (small) batch side shuffling into the store's
    // bucketing. Plain appended parquet re-shuffled the whole store per
    // micro-batch.
    import org.apache.spark.sql.functions.col
    val store = spark.table(StreamDedup.storeTableName(root))
    val probe = Seq((99L, 0, 123L)).toDF("doc_id", "band", "bh")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = store.as("a").join(probe.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("Bucketed: true"),
        s"store scan must be bucketed:\n${plan.linesIterator.take(30).mkString("\n")}")
      assert("\\(\\d+\\) Exchange".r.findAllIn(plan).size == 1,
        s"only the batch side may shuffle:\n${plan.linesIterator.take(30).mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)

    // store compaction (OPTIMIZE): per-batch file fragments fold to one
    // file per partition/bucket, counts unchanged, and the store still
    // serves — a third batch after compaction must keep deduping against
    // the compacted history
    StreamDedup.compactStore(spark, root)
    assert(spark.read.parquet(s"$root/store_sets").count() == 5,
      "compaction must preserve the signature rows")
    assert(spark.table(StreamDedup.storeTableName(root)).count() == 5 * 16,
      "compaction must preserve the band rows")
    val setsFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/store_sets"))
      .filter(_.isDirectory)
      .flatMap(d => fs.listStatus(d.getPath))
      .count(f => f.getPath.getName.startsWith("part-"))
    val setsParts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/store_sets"))
      .count(_.isDirectory)
    assert(setsFiles == setsParts,
      s"each surviving partition must hold ONE file, got $setsFiles files in $setsParts partitions")
    stage(Seq((20L, base + " thirdtail"), // near-dup of 1 via compacted store
      (21L, "unrelated words entirely about benchmarking storage engines")),
      "b2", 1700000120000L)
    StreamDedup.start(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing), root).awaitTermination()
    val kept2 = spark.read.parquet(s"$root/kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 3L, 11L, 21L),
      s"post-compaction batch must still dedup against history, got $kept2")

    // THE other scale property (r5's weak spot): the verify stage's store
    // read is PRUNED by the candidate aid set — a partition filter on the
    // doc_id-modulo bucket plus a pushed id filter inside the surviving
    // partitions. No full store_sets scan per micro-batch.
    val like = spark.read.parquet(s"$root/store_sets").select("doc_id", "hs")
    val pruned = StreamDedup.prunedStoreSets(spark, root, Array(1L, 3L), like)
    val prunedPlan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[.*sbucket".r.findFirstIn(prunedPlan).nonEmpty,
      s"candidate buckets must partition-prune the store:\n$prunedPlan")
    assert(prunedPlan.contains("PushedFilters: [In(doc_id"),
      s"the aid set must push into the parquet scan:\n$prunedPlan")
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("hot band: a batch of near-identical docs dedups correctly and the " +
       "above-cap fallback never collects ids") {
    import spark.implicits._
    val boiler = "terms of service apply to all users of this website please " +
      "read carefully before proceeding with registration " * 4
    // a boilerplate-heavy corpus: every doc shares almost all shingles →
    // every band hash collides → the store's (band, bh) buckets go HOT
    val batch0 = (0L until 12L).map(i => (i, boiler + s" suffix$i"))
    val batch1 = Seq((100L, boiler + " yetanothersuffix"), // dup of all 12
      (101L, "genuinely novel content about distributed query planning today"))
    val root = graft.core.Scratch.dir("stream_hotband_spec")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val landing = s"$root/landing"
    def stage(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val stageDir = s"$root/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stageDir)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
      val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
      fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
      fs.setTimes(dst, mtime, -1)
    }
    stage(batch0, "b0", 1700000000000L)
    stage(batch1, "b1", 1700000060000L)
    val schema = spark.read.parquet(s"$landing/b0.parquet").schema
    StreamDedup.start(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing), root)
      .awaitTermination()
    val kept = spark.read.parquet(s"$root/kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // smallest id survives the hot band; 100 is dominated by prior batch
    assert(kept == Set(0L, 101L),
      s"hot-band corpus must keep only the first doc + the novel one, got $kept")

    // the fallback path (candidate count above AidPushdownCap): the store
    // read is pruned by sbucket partitions ONLY — no per-id parquet
    // pushdown, so nothing driver-side scales with the candidate count
    val like = spark.read.parquet(s"$root/store_sets").select("doc_id", "hs")
    val cands = (0L until 12L).map(a => (a, 100L)).toDF("aid", "bid")
    val fallback = StreamDedup.storeSetsForVerify(
      spark, root, cands, StreamDedup.AidPushdownCap + 1, like)
    val plan = fallback.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[.*sbucket".r.findFirstIn(plan).nonEmpty,
      s"fallback must still partition-prune by bucket:\n$plan")
    assert(!plan.contains("PushedFilters: [In(doc_id"),
      s"fallback must NOT push a per-id filter (ids never hit the driver):\n$plan")
    // and it still feeds the verify join correctly: all 13 stored docs of
    // the candidates' buckets come back (ids 0..11 + 100 span all buckets)
    assert(fallback.select("doc_id").collect().map(_.getLong(0)).toSet
      .intersect((0L until 12L).toSet) == (0L until 12L).toSet)

    // below the cap the id set IS pushed (the common fast path)
    val fast = StreamDedup.storeSetsForVerify(spark, root, cands, 12L, like)
    assert(fast.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      .contains("PushedFilters: [In(doc_id"))
  }

  test("a layout-v1 band store (no size column) fails loud on open") {
    import spark.implicits._
    val root = graft.core.Scratch.dir("stream_neardup_v1store")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    // a pre-upgrade store: band rows WITHOUT the v2 shingle-set size `n`
    Seq((1L, 0, 42L), (2L, 1, 43L)).toDF("doc_id", "band", "bh")
      .write.parquet(s"$root/store_bands")
    // the v2 batch-side schema the candidate join would create the
    // catalog table from — silently reading `n` as NULL under it is the
    // bug: the size-prune predicate drops every historical candidate
    val v2like = Seq((9L, 0, 0L, 10))
      .toDF("doc_id", "band", "bh", "n").limit(0)
    val e = intercept[IllegalStateException] {
      StreamDedup.readStoreBands(spark, root, v2like)
    }
    assert(e.getMessage.contains("layout v1") &&
      e.getMessage.contains("re-ingest"),
      s"must name the layout and the remedy, got: ${e.getMessage}")
    // and the guard must not have left a half-registered catalog entry
    assert(!spark.catalog.tableExists(StreamDedup.storeTableName(root)))
  }
}
