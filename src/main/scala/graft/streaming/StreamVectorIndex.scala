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
                                  baseDir: String, watermark: Long): Unit = {
    val props = new java.util.Properties()
    props.setProperty("baseDir", baseDir)
    props.setProperty("watermark", watermark.toString)
    val p = new Path(dir, CompactionFile)
    val out = fsOf(spark, p).create(p, true)
    try props.store(out, "graft vector-index compaction epoch")
    finally out.close()
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

  /** Merge-on-read code rows: compacted base (cell-partitioned) + live
    * POST-WATERMARK deltas. Append-only (embedding rows are immutable in
    * the pipeline), so the merge is a union — no tombstone pass. */
  def codesView(spark: SparkSession, dir: String): DataFrame = {
    val comp = compactionInfo(spark, dir)
    val base = comp.map { case (baseDir, _) =>
      spark.read.parquet(s"$baseDir/_codes") }
    val delta =
      if (deltaBatches(spark, dir).isEmpty) None
      else Some {
        val d = spark.read.parquet(s"$dir/_codes_delta")
          .withColumn("batch_id", col("batch_id").cast("long"))
        comp.map(_._2).fold(d)(w => d.filter(col("batch_id") > w))
          .drop("batch_id")
      }
    (base ++ delta)
      .reduceOption(_ unionByName _)
      .getOrElse(throw new IllegalStateException(
        s"no code rows (no deltas and no compacted base) at $dir"))
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
    writeCompactionInfo(spark, dir, outDir, newWatermark)
    val fs = fsOf(spark, new Path(dir))
    live.filter(_ <= newWatermark).foreach(id =>
      fs.delete(new Path(s"$dir/_codes_delta/batch_id=$id"), true))
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
