package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.Similarity

/** Streamed embedding ingest must serve the SAME top-k as a batch encode
  * against the same frozen quantizer artifacts, across the full
  * delta → compact → delta lifecycle. */
class StreamVectorIndexSpec extends SparkSpec {

  test("delta ingest + compaction serve identically to batch ADC") {
    import spark.implicits._
    // clustered 16-dim corpus (m=8 → 2-dim sub-spaces), deterministic
    def vec(i: Long): Array[Float] = {
      val c = (i % 4).toInt
      Array.tabulate(16)(d =>
        (math.sin(c * 16 + d) + 0.05 * math.cos(i * 7 + d)).toFloat)
    }
    val all = (0L until 40L).map(i => (i, vec(i)))
    val emb = all.toDF("vec_id", "embedding")
    val root = graft.core.Scratch.dir("vec_stream_spec")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // encode before training exists must fail loud
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/landing"))
    val untrained = intercept[IllegalArgumentException] {
      StreamVectorIndex.start(
        spark.readStream.schema(emb.schema).parquet(s"$root/landing"), root)
    }
    assert(untrained.getMessage.contains("writeQuantizer"))

    // one-time training on the full corpus; frozen thereafter
    Similarity.writeQuantizer(emb, root, nlist = 4, m = 8, ncent = 16,
      trainIters = 2)

    val landing = s"$root/landing"
    def stage(rows: Seq[(Long, Array[Float])], name: String, mtime: Long): Unit = {
      val stageDir = s"$root/stage_$name"
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(stageDir)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$stageDir/part-*")).head.getPath
      fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
      val dst = new org.apache.hadoop.fs.Path(s"$landing/$name.parquet")
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
      fs.setTimes(dst, mtime, -1)
    }
    stage(all.take(20), "b0", 1700000000000L)
    stage(all.slice(20, 32), "b1", 1700000060000L)
    StreamVectorIndex.start(spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing), root)
      .awaitTermination()

    // batch baseline: the SAME persisted artifacts, in-memory encode
    def baseline(corpus: Seq[(Long, Array[Float])], k: Int): Seq[(Long, Double)] = {
      val df = corpus.toDF("vec_id", "embedding")
      val (cents, norms) = Similarity.readQuantizer(spark, root)
      val books = Similarity.readPqCodebooks(spark, root)
      val qv = vec(0L).map(_.toDouble)
      val probes = Similarity.nearestCells(qv, cents, norms, 2)
      val codes = df.select(col("vec_id"),
          Similarity.cellExpr(col("embedding").cast("array<double>"), cents, norms).as("cell"),
          Similarity.pqEncode(col("embedding").cast("array<double>"), books).as("pq_codes"))
        .filter(col("cell").isin(probes: _*))
      Similarity.pqTopKOnCodes(codes, qv, books, 0L, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    def served(k: Int): Seq[(Long, Double)] =
      StreamVectorIndex.topK(emb, root, 0L, k, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val ingested = all.take(32)
    assert(served(8) == baseline(ingested, 8),
      "pre-compaction delta serving must equal the batch encode")

    // compact: base becomes a complete ivfPqTopK-servable layout
    val base1 = graft.core.Scratch.dir("vec_stream_spec_base1")
    fs.delete(new org.apache.hadoop.fs.Path(base1), true)
    StreamVectorIndex.compact(spark, root, base1)
    assert(served(8) == baseline(ingested, 8),
      "post-compaction serving must be unchanged")
    val viaIvfPq = Similarity.ivfPqTopK(emb, base1, 0L, 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIvfPq == baseline(ingested, 8),
      "the compacted base must serve through plain ivfPqTopK")
    assert(StreamVectorIndex.compactionInfo(spark, root).exists(_._2 == 1L),
      "watermark must be the highest folded batch id")
    // folded delta partitions are physically gone
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/_codes_delta/batch_id=0")))

    // a post-compaction batch lands as a new delta and serves immediately
    stage(all.drop(32), "b2", 1700000120000L)
    StreamVectorIndex.start(spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing), root)
      .awaitTermination()
    assert(served(8) == baseline(all, 8),
      "base + fresh delta must serve the full corpus")

    // second compaction epoch: new base dir, watermark advances
    val base2 = graft.core.Scratch.dir("vec_stream_spec_base2")
    fs.delete(new org.apache.hadoop.fs.Path(base2), true)
    StreamVectorIndex.compact(spark, root, base2)
    assert(StreamVectorIndex.compactionInfo(spark, root)
      .exists(i => i._1 == base2 && i._2 == 2L))
    assert(served(8) == baseline(all, 8))
    // compacting INTO the live base is refused
    val clash = intercept[IllegalArgumentException] {
      StreamVectorIndex.compact(spark, root, base2)
    }
    assert(clash.getMessage.contains("CURRENT base"))
  }

  private def vec2(i: Long): Array[Float] = {
    val c = (i % 4).toInt
    Array.tabulate(16)(d =>
      (math.sin(c * 16 + d) + 0.05 * math.cos(i * 7 + d)).toFloat)
  }

  private def setup(name: String, rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    val root = graft.core.Scratch.dir(name)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    Similarity.writeQuantizer(rows.toDF("vec_id", "embedding"), root,
      nlist = 4, m = 8, ncent = 16, trainIters = 2)
    val landing = s"$root/landing"
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/stage0")
    val part = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/stage0/part-*")).head.getPath
    fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(s"$landing/b0.parquet"), false, hconf)
    StreamVectorIndex.start(spark.readStream
      .schema(rows.toDF("vec_id", "embedding").schema).parquet(landing), root)
      .awaitTermination()
    (root, fs)
  }

  private def adcBaseline(root: String, corpus: Seq[(Long, Array[Float])],
                          k: Int): Seq[(Long, Double)] = {
    import spark.implicits._
    val df = corpus.toDF("vec_id", "embedding")
    val (cents, norms) = Similarity.readQuantizer(spark, root)
    val books = Similarity.readPqCodebooks(spark, root)
    val qv = vec2(0L).map(_.toDouble)
    val probes = Similarity.nearestCells(qv, cents, norms, 2)
    val codes = df.select(col("vec_id"),
        Similarity.cellExpr(col("embedding").cast("array<double>"), cents, norms).as("cell"),
        Similarity.pqEncode(col("embedding").cast("array<double>"), books).as("pq_codes"))
      .filter(col("cell").isin(probes: _*))
    Similarity.pqTopKOnCodes(codes, qv, books, 0L, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("delete and upsert serve merge-on-read; compaction folds the tombstones") {
    import spark.implicits._
    val all = (0L until 20L).map(i => (i, vec2(i)))
    val (root, fs) = setup("vec_stream_del", all)
    def served(k: Int): Seq[(Long, Double)] =
      StreamVectorIndex.topK(all.toDF("vec_id", "embedding"), root, 0L, k,
          nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // delete two ids: serving == a corpus that never held them
    StreamVectorIndex.delete(spark, root, Seq(4L, 8L).toDF("vec_id"))
    val afterDel = all.filterNot(t => Set(4L, 8L).contains(t._1))
    assert(served(6) == adcBaseline(root, afterDel, 6),
      "deleted ids must vanish from serving")

    // upsert id 3 with a cluster-0 vector: old version dies, new one serves
    val new3 = vec2(20L) // cluster 0, distinct from every ingested vector
    StreamVectorIndex.upsert(spark, root, Seq((3L, new3)).toDF("vec_id", "embedding"))
    val afterUp = afterDel.filterNot(_._1 == 3L) :+ (3L, new3)
    assert(served(6) == adcBaseline(root, afterUp, 6),
      "the upserted vector must replace its old version")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/_codes_delta/batch_id=1/${StreamVectorIndex.UpsertMarker}")),
      "the minted partition must carry the upsert marker")

    // compaction folds tombstones into the base and truncates them
    val base = graft.core.Scratch.dir("vec_stream_del_base")
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    StreamVectorIndex.compact(spark, root, base)
    assert(served(6) == adcBaseline(root, afterUp, 6),
      "post-compaction serving must be unchanged")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_tombstones/as_of=0")),
      "folded tombstones must be physically truncated")
    val viaIvfPq = Similarity.ivfPqTopK(all.toDF("vec_id", "embedding"),
        base, 0L, 6, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIvfPq == adcBaseline(root, afterUp, 6),
      "the compacted base must hold only surviving versions")

    // a delete against an empty log is a no-op
    val emptyRoot = graft.core.Scratch.dir("vec_stream_del_empty")
    fs.delete(new org.apache.hadoop.fs.Path(emptyRoot), true)
    StreamVectorIndex.delete(spark, emptyRoot, Seq(1L).toDF("vec_id"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$emptyRoot/_tombstones")))
  }

  test("a stream whose checkpoint collides with an upsert-minted batch fails loud") {
    import spark.implicits._
    val all = (0L until 12L).map(i => (i, vec2(i)))
    val (root, fs) = setup("vec_stream_guard", all)
    StreamVectorIndex.upsert(spark, root,
      Seq((3L, vec2(20L))).toDF("vec_id", "embedding")) // mints batch 1
    // a fresh checkpoint restarts batch ids at 0; its SECOND batch lands
    // on the minted id — the two writers' id spaces have collided
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_checkpoint"), true)
    val landing = s"$root/landing"
    for (n <- Seq("c0", "c1")) {
      all.take(2).toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/stage_$n")
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$root/stage_$n/part-*")).head.getPath
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
        new org.apache.hadoop.fs.Path(s"$landing/$n.parquet"), false,
        spark.sparkContext.hadoopConfiguration)
    }
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamVectorIndex.start(spark.readStream
        .schema(all.toDF("vec_id", "embedding").schema)
        .option("maxFilesPerTrigger", 1).parquet(landing), root)
        .awaitTermination()
    }
    assert(boom.getMessage.contains("minted by upsert"),
      s"expected the loud two-writer failure, got: ${boom.getMessage}")
  }
}
