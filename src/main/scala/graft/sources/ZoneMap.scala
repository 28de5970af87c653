package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZONE-MAP data skipping — the lakehouse technique (Delta/Iceberg file
  * statistics, Snowflake micro-partition pruning) for predicates on
  * columns the directory layout does NOT partition by: the writer
  * range-clusters rows so each FILE covers a narrow slice of the zone
  * columns and records per-file min/max in a manifest; the reader
  * intersects query ranges with the manifest and hands Spark only the
  * surviving files.
  *
  * Scale story: partition directories can carry one or two columns before
  * path explosion; zone maps give file-level pruning on any clustered
  * column for the cost of a manifest that is |files|-sized (thousands of
  * rows at 100 TB — a broadcast, not a table). Parquet row-group stats do
  * the same INSIDE a file, but only after the footer of every file is
  * opened; the manifest prunes before any file I/O.
  *
  * The manifest is derived with one aggregation over the written data
  * (write-time cost, amortized over every read); `read` does a driver-side
  * filter of the tiny manifest — never a corpus pass.
  */
object ZoneMap {

  /** Range-cluster `df` by `zoneCols` into ~`nFiles` files under
    * `dir/data` and write the per-file min/max manifest to
    * `dir/manifest`. */
  def write(df: DataFrame, dir: String, zoneCols: Seq[String],
            nFiles: Int = 16): Unit = {
    require(zoneCols.nonEmpty, "at least one zone column")
    val cols = zoneCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(s"$dir/data")
    writeManifest(df.sparkSession, dir, zoneCols)
  }

  /** Z-ORDER clustered write (Delta `OPTIMIZE ZORDER BY`, Iceberg z-order
    * sort analogue): [[write]]'s lexicographic range-clustering gives the
    * LEADING zone column tight per-file ranges and every later column
    * nearly full-range files — a predicate on the second column alone
    * prunes nothing. Here each column maps to its quantile-rank bucket
    * (2^bits buckets from a distributed approxQuantile sample — no global
    * window, skew-resistant where equal-width bucketing is not), the
    * bucket codes bit-interleave into one Morton code
    * ([[graft.ext.ZOrderCodeExpr]]), and files range-cluster on that code
    * — so EVERY zone column gets file locality at ~bits-per-column
    * resolution. The manifest records per-file min/max of the ORIGINAL
    * columns; [[pruneFiles]]/[[read]] work unchanged, and the layout
    * never changes query results — only how many files a multi-column
    * range predicate has to open.
    *
    * Zone columns must cast to double (numeric / date / timestamp);
    * strings have no meaningful range locality to interleave. NULLs code
    * as bucket 0 (sort-first). Write-time cost: one quantile sketch pass
    * per column + the clustering shuffle — amortized over every read. */
  def writeZOrdered(df: DataFrame, dir: String, zoneCols: Seq[String],
                    nFiles: Int = 16, bits: Int = 8): Unit = {
    require(zoneCols.size >= 2,
      "z-order pays off on 2+ columns; use write() for a single column")
    require(bits >= 1 && bits * zoneCols.size <= 63,
      s"bits × columns must fit a long: $bits × ${zoneCols.size}")
    val spark = df.sparkSession
    val zd = zoneCols.zipWithIndex.map { case (c, i) =>
      col(c).cast("double").as(s"_zd$i")
    }
    val withD = df.select(df.columns.map(col) ++ zd: _*)
    val nB = (1 << bits) - 1
    val probs = (1 to nB).map(_.toDouble / (nB + 1)).toArray
    val bounds = zoneCols.indices.map { i =>
      withD.stat.approxQuantile(s"_zd$i", probs, 0.001).distinct.sorted
    }
    val zexpr = graft.ext.ZOrderCodeExpr(
      zoneCols.map(c => org.apache.spark.sql.GraftColumnBridge.expression(
        col(c).cast("double"))),
      bounds, bits)
    df.withColumn("_zcode", org.apache.spark.sql.GraftColumnBridge.column(zexpr))
      .repartitionByRange(nFiles, col("_zcode"))
      .sortWithinPartitions("_zcode")
      .drop("_zcode")
      .write.mode("overwrite").parquet(s"$dir/data")
    writeManifest(spark, dir, zoneCols)
  }

  /** Per-file min/max stats over the written data — one aggregation,
    * |files| rows. */
  private def writeManifest(spark: SparkSession, dir: String,
                            zoneCols: Seq[String]): Unit = {
    val data = spark.read.parquet(s"$dir/data")
    val aggs = zoneCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    data.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** An inclusive range predicate on one zone column: keep files whose
    * [min, max] INTERSECTS [lo, hi] (either bound may be null = open). */
  final case class ZoneRange(column: String, lo: Any, hi: Any)

  /** Files surviving the manifest intersection, plus the total count —
    * exposed so callers (and tests) can see the pruning ratio. */
  final case class Pruned(files: Seq[String], total: Long)

  def pruneFiles(spark: SparkSession, dir: String,
                 ranges: Seq[ZoneRange]): Pruned = {
    val manifest = spark.read.parquet(s"$dir/manifest")
    val total = manifest.count()
    val fieldTypes = manifest.schema.fields.map(f => f.name -> f.dataType).toMap
    val pred = ranges.map { r =>
      val dt = fieldTypes.getOrElse(s"min_${r.column}",
        throw new IllegalArgumentException(
          s"zone column '${r.column}' has no manifest stats; manifest columns: " +
            fieldTypes.keys.toSeq.sorted.mkString(", ")))
      // Cast each bound to the zone column's OWN type and fail loud if the
      // cast is lossy-to-null (e.g. a malformed date string vs a timestamp
      // zone): an implicit null bound would turn the whole predicate NULL
      // and silently prune EVERY file instead of erroring.
      def bound(v: Any, which: String): Column = {
        val c = lit(v).cast(dt)
        // ANSI mode throws on the probe itself; legacy mode yields NULL —
        // either way the caller gets the same loud error
        val ok =
          try spark.range(1).select(c.isNotNull).head().getBoolean(0)
          catch { case _: Exception => false }
        require(ok, s"zone $which bound '$v' is not castable to ${r.column}'s type $dt")
        c
      }
      val keepLo = Option(r.hi)
        .map(h => col(s"min_${r.column}") <= bound(h, "hi")).getOrElse(lit(true))
      val keepHi = Option(r.lo)
        .map(l => col(s"max_${r.column}") >= bound(l, "lo")).getOrElse(lit(true))
      keepLo && keepHi
    }.reduceOption(_ && _).getOrElse(lit(true))
    // the manifest is |files|-sized: this collect is the point, not a leak
    Pruned(manifest.filter(pred).select("file")
      .collect().map(_.getString(0)).toSeq, total)
  }

  /** Read with file skipping. The residual predicate still applies (zone
    * pruning is a superset filter, exactly like partition pruning); an
    * empty survivor set returns an empty frame with the data schema. */
  def read(spark: SparkSession, dir: String,
           ranges: Seq[ZoneRange]): DataFrame = {
    val pruned = pruneFiles(spark, dir, ranges)
    val residual = ranges.map { r =>
      val geLo = Option(r.lo).map(l => col(r.column) >= lit(l)).getOrElse(lit(true))
      val leHi = Option(r.hi).map(h => col(r.column) <= lit(h)).getOrElse(lit(true))
      geLo && leHi
    }.reduceOption(_ && _).getOrElse(lit(true))
    val base =
      if (pruned.files.isEmpty)
        spark.read.parquet(s"$dir/data").limit(0)
      else spark.read.parquet(pruned.files: _*)
    base.filter(residual)
  }
}
