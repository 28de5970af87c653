package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-corpus source on the DataSource V2 plugin API
  * (§2.1 Source plugin API — the reference's `RelationProvider`/
  * `PrunedFilteredScan` contract, sources/interfaces.scala:71,267,
  * re-expressed on Spark's current connector interfaces). Rows are a pure
  * function of `doc_id`, so a 100 TB-shaped corpus can be *generated* on
  * the executors — no input I/O, no skew, parallelism = `partitions` —
  * for scale rehearsal of the text pipeline, and a DuckDB oracle can
  * replay every row from `range()`.
  *
  *   spark.read.format("graft-synth")
  *     .option("rows", n).option("partitions", p).load()
  *
  * Schema: doc_id BIGINT, lang STRING, n_tokens INT, text STRING with
  * lang = langs[doc_id % 4], n_tokens = 1 + doc_id % 32,
  * text = "w((doc_id+i) % 16)" for i < n_tokens, space-joined.
  *
  * The plugin surface is exercised for real, not vestigially:
  *  - [[SupportsPushDownFilters]]: doc_id range predicates are CONSUMED
  *    (returned residual-free) and clip the generated range at PLANNING
  *    time — the DSv2 analogue of partition pruning; a fully-clipped
  *    range plans zero partitions.
  *  - [[SupportsPushDownRequiredColumns]]: readers materialize only the
  *    pruned columns (`text`, the expensive one, is never built unless
  *    projected).
  */
object SynthDocs {
  val Langs: Array[String] = Array("en", "de", "fr", "ja")

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  def nTokens(id: Long): Int = 1 + (id % 32).toInt

  def text(id: Long): String = {
    val n = nTokens(id)
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append('w').append((id + i) % 16)
      i += 1
    }
    sb.toString
  }
}

class SynthDocsProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("rowsPerBatch", "250").toLong)
}

private[sources] class SynthTable(rows: Long, partitions: Int,
                                  rowsPerBatch: Long)
    extends Table with SupportsRead {
  require(rows >= 0 && partitions > 0 && rowsPerBatch > 0,
    s"graft-synth needs rows >= 0, partitions > 0, rowsPerBatch > 0, " +
      s"got $rows/$partitions/$rowsPerBatch")
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, rowsPerBatch)
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int,
                                        rowsPerBatch: Long = 250L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SynthDocs.schema

  // doc_id range predicates clip the generated range at planning time —
  // the generator's partition pruning. Anything else stays a Spark-side
  // residual (returned from pushFilters).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, residual) = filters.partition {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull(_) => true // nothing is nullable here
      case _ => false
    }
    pushed = consumed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SynthScan(lo, hi, partitions, required, rowsPerBatch)
}

private[sources] case class SynthRange(lo: Long, hi: Long,
                                       schema: StructType)
    extends InputPartition

private[sources] class SynthScan(lo: Long, hi: Long, partitions: Int,
                                 required: StructType,
                                 rowsPerBatch: Long = 250L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    (0 until p).map { i =>
      // contiguous, balanced chunks of the CLIPPED range
      val start = lo + n * i / p
      val end = lo + n * (i + 1) / p
      SynthRange(start, end, required): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory

  // STREAMING source plugin (§2.10 + §2.1: the reference's
  // streaming Source/Offset contract — execution/streaming/Source.scala —
  // re-expressed on MicroBatchStream): the offset is simply "rows emitted
  // so far"; each trigger admits the next `rowsPerBatch` ids until the
  // configured total is drained, then latestOffset stops advancing and
  // processAllAvailable() unblocks. Batch and stream share the SAME
  // partition/reader machinery, so stream∘agg ≡ batch∘agg by
  // construction — the equivalence the oracle row asserts.
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(hi, partitions, required, rowsPerBatch)
}

private[sources] case class SynthOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

private[sources] class SynthMicroBatchStream(rows: Long, partitions: Int,
                                             required: StructType,
                                             rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // Trigger.AvailableNow: the drain target is the configured total, which
  // is already fixed — admission still advances rowsPerBatch per trigger
  // (multi-batch drain, not one giant batch) and stops at `rows`, which
  // is exactly the AvailableNow contract. Without this marker Spark
  // would wrap the source and freeze the FIRST latestOffset() as the
  // target, draining a single batch.
  override def prepareForTriggerAvailableNow(): Unit = ()

  // SupportsAdmissionControl (pulled in by the AvailableNow marker): the
  // PROPER per-batch admission API — stateless, start-offset-driven, so
  // a checkpoint restart resumes from the committed offset with no
  // driver-side cursor involved.
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val from = start.asInstanceOf[SynthOffset].n
    val step = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        m.maxRows()
      case _ => rowsPerBatch
    }
    SynthOffset(math.min(rows, from + step))
  }
  // monotonic admission cursor; deserializeOffset bumps it so a restart
  // from a checkpoint never reports latest < start
  private var planned = 0L

  override def initialOffset(): Offset = SynthOffset(0L)
  override def latestOffset(): Offset = {
    planned = math.min(rows, planned + rowsPerBatch)
    SynthOffset(planned)
  }
  override def deserializeOffset(json: String): Offset = {
    val n = json.trim.toLong
    planned = math.max(planned, n)
    SynthOffset(n)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SynthOffset].n
    val hi = end.asInstanceOf[SynthOffset].n
    val n = math.max(0L, hi - lo)
    if (n == 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    (0 until p).map { i =>
      SynthRange(lo + n * i / p, lo + n * (i + 1) / p, required): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory
}

private[sources] class SynthReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SynthRange]
    new SynthReader(r.lo, r.hi, r.schema)
  }
}

private[sources] class SynthReader(lo: Long, hi: Long, schema: StructType)
    extends PartitionReader[InternalRow] {
  private var id = lo - 1
  // column generators bound once per reader, honoring the pruned schema:
  // a projection without `text` never pays the string build
  private val gens: Array[Long => Any] = schema.fields.map { f =>
    f.name match {
      case "doc_id" => (i: Long) => i
      case "lang" => (i: Long) =>
        UTF8String.fromString(SynthDocs.Langs((i % 4).toInt))
      case "n_tokens" => (i: Long) => SynthDocs.nTokens(i)
      case "text" => (i: Long) => UTF8String.fromString(SynthDocs.text(i))
      case other => throw new IllegalArgumentException(
        s"graft-synth has no column '$other'")
    }
  }
  override def next(): Boolean = { id += 1; id < hi }
  override def get(): InternalRow =
    InternalRow.fromSeq(gens.toSeq.map(_(id)))
  override def close(): Unit = ()
}
