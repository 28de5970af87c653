package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: phase breakdown of the q_fts_compacted_sql lifecycle at sf0.1 —
  * which of ingest / compact-read / Index.write / truncation / registration /
  * SQL-serve carries the r6 regression. */
object DebugCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.ext.GraftExtensions.install(spark)
    val deltaDir = graft.core.Scratch.dir("dbg_csql_delta")
    val outDir = graft.core.Scratch.dir("dbg_csql_out")
    val landing = graft.core.Scratch.dir("dbg_csql_stream")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(deltaDir, outDir, landing).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.copy(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(landing).resolve("documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    time("ingest (stream -> delta)") {
      graft.fts.IncrementalIndex.start(
        spark.readStream.schema(schema).parquet(landing), deltaDir)
        .awaitTermination()
    }
    val ix = time("read (merge-on-read view)") {
      graft.fts.IncrementalIndex.read(spark, deltaDir)
    }
    // warm-up fold so JIT/codegen costs don't land on the first variant
    time("Index.write (cold warm-up)") {
      graft.fts.Index.write(ix, outDir)
    }
    import org.apache.spark.sql.functions._
    def writeR5Style(out: String): Unit = {
      ix.postings
        .withColumn("bucket", pmod(xxhash64(col("term")), lit(64)))
        .repartition(col("bucket"))
        .sortWithinPartitions("bucket", "term")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$out/postings")
      ix.docLens.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/doclens")
      ix.stats.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/stats")
    }
    for (i <- 1 to 2) {
      time(s"write WITHOUT dl window (r5) #$i") {
        val o = graft.core.Scratch.dir("dbg_csql_r5w")
        fs.delete(new org.apache.hadoop.fs.Path(o), true); writeR5Style(o)
      }
      time(s"write WITH dl window (r6) #$i") {
        val o = graft.core.Scratch.dir("dbg_csql_r6w")
        fs.delete(new org.apache.hadoop.fs.Path(o), true)
        graft.fts.Index.write(ix, o)
      }
    }
    // LAST: compact() truncates the delta partitions ix reads from
    time("full compact() to fresh dir") {
      val outDir2 = graft.core.Scratch.dir("dbg_csql_out2")
      fs.delete(new org.apache.hadoop.fs.Path(outDir2), true)
      graft.fts.IncrementalIndex.compact(spark, deltaDir, outDir2)
    }
    time("registration (writeMeta+register)") {
      graft.fts.IndexCatalog.register(landing, outDir, "doc_id", "text", 64,
        positional = false)
      graft.fts.IndexCatalog.writeMeta(spark, landing, outDir, "doc_id",
        "text", 64, positional = false)
    }
    spark.read.parquet(landing).createOrReplaceTempView("documents_dbg")
    time("SQL serve (fts_match)") {
      spark.sql("""SELECT doc_id FROM documents_dbg
                   WHERE fts_match(text, 'spark query')
                   ORDER BY doc_id""").collect()
    }
    time("SQL serve again (warm)") {
      spark.sql("""SELECT doc_id FROM documents_dbg
                   WHERE fts_match(text, 'spark query')
                   ORDER BY doc_id""").collect()
    }
    spark.stop()
  }
}
