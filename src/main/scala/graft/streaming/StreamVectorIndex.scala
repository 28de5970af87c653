package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Similarity

/** Incremental IVF-PQ index maintenance for streaming EMBEDDING ingest —
  * the vector-side mirror of [[graft.fts.IncrementalIndex]]'s delta/epoch
  * lifecycle. A training-data pipeline ingests embeddings continuously;
  * rebuilding the celled layout per batch would re-encode the corpus, so:
  *
  *  1. [[Similarity.writeQuantizer]] trains the coarse centroids + PQ
  *     codebooks ONCE up front (the artifacts are frozen — every later
  *     step encodes against them, the serve-never-retrains contract
  *     extended to ingest; codes from any epoch stay mutually comparable);
  *  2. each micro-batch ENCODES its vectors (cell assignment + PQ codes —
  *     two native-kernel maps, no shuffle) and appends a
  *     `batch_id`-partitioned delta under `_codes_delta` with dynamic
  *     partition overwrite (crash-replayed batches idempotently replace
  *     only their own partition, exactly the FTS delta contract);
  *  3. [[compact]] folds base + deltas into a fresh CELL-partitioned base
  *     dir, records (baseDir, watermark) in `_graft_compaction.properties`,
  *     then physically truncates the folded delta partitions — base data
  *     first, metadata flip second, truncation last, so every crash window
  *     leaves a readable log ([[codesView]] filters deltas past the
  *     watermark);
  *  4. serving ([[topK]]) probes the quantizer's nprobe nearest cells: a
  *     PARTITION filter on the compacted base plus a (small, one-epoch)
  *     cell filter on the live deltas, ranked by ADC over code rows — the
  *     raw vectors are never read at serve time.
  */
object StreamVectorIndex {

  /** Compaction-epoch metadata inside the index dir. */
  val CompactionFile = "_graft_compaction.properties"

  /** Marker stamped into an [[upsert]]-minted delta partition so a stream
    * resumed from an older checkpoint fails loud instead of silently
    * colliding with the upserted id ([[graft.fts.IncrementalIndex]]'s
    * two-writer contract, applied to the vector log). */
  val UpsertMarker = "_graft_upsert"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (baseDir, watermark) of the last compaction, if any. */
  def compactionInfo(spark: SparkSession, dir: String): Option[(String, Long)] = {
    val p = new Path(dir, CompactionFile)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val props = new java.util.Properties()
      try props.load(in) finally in.close()
      Some((props.getProperty("baseDir"), props.getProperty("watermark").toLong))
    }
  }

  private def writeCompactionInfo(spark: SparkSession, dir: String,
                                  baseDir: String, watermark: Long,
                                  upsertBatches: Set[Long]): Unit = {
    val props = new java.util.Properties()
    props.setProperty("baseDir", baseDir)
    props.setProperty("watermark", watermark.toString)
    props.setProperty("upsertBatches", upsertBatches.toSeq.sorted.mkString(","))
    val p = new Path(dir, CompactionFile)
    val out = fsOf(spark, p).create(p, true)
    try props.store(out, "graft vector-index compaction epoch")
    finally out.close()
  }

  /** Upsert-minted batch ids whose partitions compaction already folded
    * and truncated — the physical markers die with their partitions, so
    * [[compact]] carries the ids forward here; without this a stream
    * resumed from a pre-upsert checkpoint would re-mint a folded upsert's
    * id post-compaction and its vectors would be silently dropped by the
    * post-watermark filter. */
  private def recordedUpsertBatches(spark: SparkSession, dir: String): Set[Long] = {
    val p = new Path(dir, CompactionFile)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      val props = new java.util.Properties()
      try props.load(in) finally in.close()
      Option(props.getProperty("upsertBatches")).toSet[String]
        .flatMap(_.split(',').iterator.filter(_.nonEmpty).map(_.toLong))
    }
  }

  /** Live delta partitions stamped with a physical [[UpsertMarker]]. */
  private def liveUpsertBatches(spark: SparkSession, dir: String): Set[Long] = {
    val fs = fsOf(spark, new Path(dir))
    deltaBatches(spark, dir).filter(id => fs.exists(
      new Path(s"$dir/_codes_delta/batch_id=$id/$UpsertMarker"))).toSet
  }

  /** Live `batch_id=N` partitions of the delta dir (one listing). */
  private def deltaBatches(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(s"$dir/_codes_delta")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }
  }

  /** Start the encode-and-append sink. The quantizer artifacts must exist
    * at `dir` ([[Similarity.writeQuantizer]] — init is a separate,
    * one-time step, like Index.write before serving). */
  def start(embStream: DataFrame, dir: String, idCol: String = "vec_id",
            vecCol: String = "embedding"): StreamingQuery = {
    val spark = embStream.sparkSession
    val q = new Path(s"$dir/_quantizer")
    require(fsOf(spark, q).exists(q),
      s"no quantizer artifacts at $dir — train once with " +
        "Similarity.writeQuantizer() before streaming (encode never trains)")
    embStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // an existing partition for this id is either a crash-replayed
        // stream batch (overwritten idempotently below) or an UPSERT batch
        // this checkpoint doesn't know about — only the latter (marker
        // physical, or carried across compaction) means the two writers'
        // id spaces collided: fail loud, mirroring the FTS delta log
        val part = new Path(s"$dir/_codes_delta/batch_id=$batchId")
        if (fsOf(s, part).exists(new Path(part, UpsertMarker)) ||
            recordedUpsertBatches(s, dir).contains(batchId))
          throw new IllegalStateException(
            s"delta batch $batchId at $dir was minted by upsert(); the " +
              "stream's checkpointed batch counter has fallen behind the " +
              "delta log. Restart the ingest with a fresh checkpoint, or " +
              "quiesce upserts while a stream checkpoint is live.")
        val (cents, norms) = Similarity.readQuantizer(s, dir)
        val books = Similarity.readPqCodebooks(s, dir)
        val v = col(vecCol).cast("array<double>")
        batch.select(col(idCol),
            Similarity.cellExpr(v, cents, norms).as("cell"),
            Similarity.pqEncode(v, books).as("pq_codes"))
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$dir/_codes_delta")
      }
      .start()
  }

  /** Code rows with their effective batch (`_b`): compacted-base rows
    * participate as one pseudo-batch AT the watermark (so post-compaction
    * tombstones reach them), live deltas carry their real id and are
    * restricted to post-watermark (truncation already removed the folded
    * partitions; the filter guards the crash window — and it is a
    * PARTITION filter). */
  private def rawCodes(spark: SparkSession, dir: String): DataFrame = {
    val comp = compactionInfo(spark, dir)
    val base = comp.map { case (baseDir, w) =>
      spark.read.parquet(s"$baseDir/_codes").withColumn("_b", lit(w)) }
    val delta =
      if (deltaBatches(spark, dir).isEmpty) None
      else Some {
        val d = spark.read.parquet(s"$dir/_codes_delta")
          .withColumn("batch_id", col("batch_id").cast("long"))
        comp.map(_._2).fold(d)(w => d.filter(col("batch_id") > w))
          .withColumn("_b", col("batch_id")).drop("batch_id")
      }
    (base ++ delta)
      .reduceOption(_ unionByName _)
      .getOrElse(throw new IllegalStateException(
        s"no code rows (no deltas and no compacted base) at $dir"))
  }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(s"$dir/_tombstones")
    val fs = fsOf(spark, p)
    // truncation can leave the dir with no live as_of= partitions — an
    // empty parquet dir has no inferable schema, so probe the partitions
    val live = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isDirectory &&
        s.getPath.getName.startsWith("as_of="))
    if (!live) None
    else Some(spark.read.parquet(p.toString)
      .withColumn("as_of", col("as_of").cast("long")))
  }

  /** Merge-on-read code rows: base + post-watermark deltas, with
    * TOMBSTONES ([[delete]]/[[upsert]]) anti-joined away — a tombstone
    * kills the id's code rows with `_b ≤ as_of`, so a later re-insert of
    * the same id survives (the versioned-delete contract shared with the
    * FTS log). Tombstones at or below the previous watermark were folded
    * by compaction and truncated with their partitions. */
  def codesView(spark: SparkSession, dir: String): DataFrame = {
    val raw = rawCodes(spark, dir)
    val watermark = compactionInfo(spark, dir).map(_._2)
    val out = tombstones(spark, dir) match {
      case None => raw
      case Some(allDels) =>
        val idName = raw.columns.filterNot(Set("cell", "pq_codes", "_b")).head
        val dels = watermark.fold(allDels)(w => allDels.filter(col("as_of") >= w))
          .select(col("id").as("del_id"), col("as_of"))
        raw.join(dels,
          raw(idName) === dels("del_id") && raw("_b") <= dels("as_of"),
          "left_anti")
    }
    out.drop("_b")
  }

  /** The log's latest batch id: live deltas and/or the folded watermark
    * (base rows count as the watermark pseudo-batch). */
  private def currentMaxBatch(spark: SparkSession, dir: String): Option[Long] =
    (deltaBatches(spark, dir) ++ compactionInfo(spark, dir).map(_._2)) match {
      case Nil => None
      case ids => Some(ids.max)
    }

  private def writeTombstones(spark: SparkSession, dir: String, ids: DataFrame,
                              idCol: String, asOf: Long): Unit =
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("as_of", lit(asOf))
      .write.mode(SaveMode.Append).partitionBy("as_of")
      .parquet(s"$dir/_tombstones")

  /** DELETE vectors from the streamed index: tombstone the ids' current
    * versions as of the latest batch — base code rows stay immutable,
    * removal is data, not mutation, and serving anti-joins the (tiny)
    * tombstone set until the next compaction folds it. Idempotent; a
    * delete before any ingest is a no-op. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String = "vec_id"): Unit =
    currentMaxBatch(spark, dir).foreach(asOf =>
      writeTombstones(spark, dir, ids, idCol, asOf))

  /** UPSERT vectors: tombstone the ids' current versions and append the
    * replacements — encoded against the SAME frozen quantizer as every
    * other epoch — as a new delta batch. An update costs one tombstone +
    * one batch-sized append, never an index rebuild. Single-writer like
    * the streaming sink; the minted partition is stamped with
    * [[UpsertMarker]] so a stale-checkpoint stream fails loud. */
  def upsert(spark: SparkSession, dir: String, vectors: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val maxBatch = currentMaxBatch(spark, dir)
    val nextBatch = maxBatch.map(_ + 1).getOrElse(0L)
    maxBatch.foreach(asOf =>
      writeTombstones(spark, dir, vectors.select(col(idCol)), idCol, asOf))
    val (cents, norms) = Similarity.readQuantizer(spark, dir)
    val books = Similarity.readPqCodebooks(spark, dir)
    val v = col(vecCol).cast("array<double>")
    vectors.select(col(idCol),
        Similarity.cellExpr(v, cents, norms).as("cell"),
        Similarity.pqEncode(v, books).as("pq_codes"))
      .withColumn("batch_id", lit(nextBatch))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$dir/_codes_delta")
    val marker = new Path(s"$dir/_codes_delta/batch_id=$nextBatch/$UpsertMarker")
    fsOf(spark, marker).create(marker, true).close()
  }

  /** Fold base + deltas into the canonical cell-partitioned layout at
    * `outDir` (a NEW dir each epoch — the current base is an input),
    * advance the epoch, truncate the folded delta partitions. The
    * quantizer artifacts are copied alongside, so the compacted base is a
    * complete [[Similarity.ivfPqTopK]]-servable layout on its own. */
  def compact(spark: SparkSession, dir: String, outDir: String): Unit = {
    compactionInfo(spark, dir).foreach { case (base, _) =>
      require(new Path(base).toUri.getPath != new Path(outDir).toUri.getPath,
        s"compact target $outDir is the CURRENT base — fold into a new " +
          "directory each epoch")
    }
    val live = deltaBatches(spark, dir)
    val newWatermark = (live ++ compactionInfo(spark, dir).map(_._2)) match {
      case Nil => throw new IllegalStateException(s"nothing to compact at $dir")
      case ids => ids.max
    }
    codesView(spark, dir)
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$outDir/_codes")
    // artifacts travel with the base (tiny files; read + rewrite)
    val cents = spark.read.parquet(s"$dir/_quantizer")
    cents.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/_quantizer")
    val books = spark.read.parquet(s"$dir/_pq")
    books.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/_pq")
    // epoch flip carries every upsert-minted id forward (the physical
    // markers die with the truncated partitions below)
    writeCompactionInfo(spark, dir, outDir, newWatermark,
      recordedUpsertBatches(spark, dir) ++ liveUpsertBatches(spark, dir))
    val fs = fsOf(spark, new Path(dir))
    live.filter(_ <= newWatermark).foreach(id =>
      fs.delete(new Path(s"$dir/_codes_delta/batch_id=$id"), true))
    // folded tombstones die too — but one at as_of = watermark must
    // SURVIVE: the base rows now carry _b = watermark, and that tombstone
    // still has to kill them (the FTS truncation boundary)
    val tomb = new Path(s"$dir/_tombstones")
    if (fs.exists(tomb))
      fs.listStatus(tomb).toSeq.filter(_.isDirectory).map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.startsWith("as_of=") &&
            n.stripPrefix("as_of=").toLong <= newWatermark - 1
        }
        .foreach(p => fs.delete(p, true))
  }

  /** ADC top-k over the streamed index: probe cells partition-prune the
    * compacted base and filter the (one-epoch) deltas; candidates are
    * ranked by ADC over their code rows. `emb` resolves the query vector
    * only (the serving contract shared with [[Similarity.ivfPqTopK]]). */
  def topK(emb: DataFrame, dir: String, queryId: Long, k: Int,
           nprobe: Int = 4, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val (centroids, cNorms) = Similarity.readQuantizer(spark, dir)
    val books = Similarity.readPqCodebooks(spark, dir)
    val qRow = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).limit(1).collect().headOption
    if (qRow.isEmpty) return Similarity.emptyTopK(emb, idCol)
    val qv = qRow.get.getSeq[Double](0).toArray
    val probes = Similarity.nearestCells(qv, centroids, cNorms, nprobe)
    Similarity.pqTopKOnCodes(
      codesView(spark, dir).filter(col("cell").isin(probes: _*)),
      qv, books, queryId, k, idCol)
  }
}
