package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal Avro format, built from scratch on the avro CORE jars that ship
  * with Spark (`avro` + `avro-mapred` — the spark-avro CONNECTOR jar is
  * absent from this image, which is what kept the §2.1 Avro row excluded).
  * Read side is a DSv2 [[TableProvider]] (`format("graft-avro")`) with
  * column pruning; write side is a distributed per-partition container
  * writer ([[AvroIo.write]]). Object-container framing, schema evolution
  * via the embedded writer schema, and hadoop-FS I/O (FsInput) all come
  * from avro itself, so the files interoperate with any Avro tooling.
  *
  * Scope (documented, fails loud outside it): flat records of
  * boolean/int/long/float/double/string/bytes, nullable via `[null, T]`
  * unions. Parallelism is per FILE (the write side emits one container
  * per partition, so a Spark-written dataset reads back with the writing
  * job's parallelism); sync-marker block splitting is the upgrade path if
  * single huge files ever appear.
  */
object AvroSchemas {
  def toAvro(st: StructType, name: String = "graft_row"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"graft-avro supports flat primitive schemas, got ${other.catalogString} for '${f.name}'")
      }
      val sch = if (f.nullable)
        Schema.createUnion(util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft", false, util.Arrays.asList(fields: _*))
  }

  def toSpark(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"graft-avro expects a top-level record, got ${s.getType}")
    StructType(s.getFields.asScala.map { f =>
      val (base, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val ts = f.schema().getTypes.asScala
          require(ts.size == 2 && ts.exists(_.getType == Schema.Type.NULL),
            s"graft-avro supports only [null, T] unions, got ${f.schema()}")
          (ts.find(_.getType != Schema.Type.NULL).get, true)
        case _ => (f.schema(), false)
      }
      val dt = base.getType match {
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.INT => IntegerType
        case Schema.Type.LONG => LongType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"graft-avro does not support avro type $other (field '${f.name}')")
      }
      StructField(f.name, dt, nullable)
    }.toSeq)
  }
}

object AvroIo {
  /** Distributed write: one Avro object container per input partition
    * (hadoop-FS create, so the destination can be any configured FS).
    * Empty partitions write no file. */
  def write(df: DataFrame, dir: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = AvroSchemas.toAvro(sparkSchema).toString
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val sch = new Schema.Parser().parse(avroJson)
        val path = new Path(dir, f"part-$i%05d.avro")
        val out = path.getFileSystem(new Configuration()).create(path, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
        w.create(sch, out)
        try rows.foreach { row =>
          val rec = new GenericData.Record(sch)
          var c = 0
          while (c < sparkSchema.length) {
            rec.put(c, row.get(c) match {
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case v => v
            })
            c += 1
          }
          w.append(rec)
        } finally w.close()
        Iterator.single(i)
      }
    }.count(): Unit
  }
}

class AvroProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-avro"

  // write path hands us the DataFrame's schema instead of inferring from
  // (possibly nonexistent) files
  override def supportsExternalMetadata(): Boolean = true

  private def listFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted.toSeq
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-avro requires .load(<dir>)"))
    val files = listFiles(dir)
    require(files.nonEmpty, s"graft-avro: no .avro files under $dir")
    val in = new FsInput(new Path(files.head), new Configuration())
    val r = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
    try AvroSchemas.toSpark(r.getSchema)
    finally r.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val dir = properties.get("path")
    new AvroTable(dir, listFiles(dir), schema)
  }
}

private[sources] class AvroTable(dir: String, files: Seq[String],
                                 schema0: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft_avro(${files.size} files)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(files, schema0)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new AvroWriteBuilder(dir, info.schema(), info.queryId())
}

/** DSv2 WRITE path — the full connector commit protocol (§2.1 plugin API,
  * write side; the reference's CreatableRelationProvider contract
  * re-expressed on WriteBuilder/BatchWrite/DataWriter):
  *  - each task writes its partition to `dir/_tmp/…-<task>.avro` (task id
  *    in the name, so a speculative or retried attempt never collides),
  *  - `DataWriter.commit` ships the temp path back as the commit message,
  *  - driver-side `BatchWrite.commit` renames every temp into place (and
  *    first deletes the previous generation under TRUNCATE = overwrite),
  *  - `abort` deletes the temps — a failed job leaves the destination
  *    untouched. This is the FileCommitProtocol shape: readers only ever
  *    see fully-committed containers. */
private[sources] class AvroWriteBuilder(dir: String, schema: StructType,
                                        queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new AvroBatchWrite(dir, schema, doTruncate, queryId)
    }
}

private[sources] case class AvroCommitMessage(tmpPath: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class AvroBatchWrite(dir: String, schema: StructType,
                                      truncate: Boolean, queryId: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(dir, AvroSchemas.toAvro(schema).toString, schema,
      queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(new Configuration())
    if (truncate && fs.exists(base))
      fs.listStatus(base)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
        .foreach(s => fs.delete(s.getPath, false))
    messages.foreach {
      case AvroCommitMessage(tmp) =>
        val t = new Path(tmp)
        val dest = new Path(base, t.getName.stripPrefix("tmp-"))
        if (!fs.rename(t, dest))
          throw new java.io.IOException(s"graft-avro commit: rename $t -> $dest failed")
      case other => throw new IllegalStateException(s"unexpected message $other")
    }
    val tmpDir = new Path(base, "_tmp")
    if (fs.exists(tmpDir) && fs.listStatus(tmpDir).isEmpty)
      fs.delete(tmpDir, true): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(new Configuration())
    messages.foreach {
      case AvroCommitMessage(tmp) => fs.delete(new Path(tmp), false): Unit
      case _ => ()
    }
  }
}

private[sources] class AvroWriterFactory(dir: String, avroJson: String,
                                         schema: StructType, queryId: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new AvroDataWriter(dir, avroJson, schema, partitionId, taskId, queryId)
}

private[sources] class AvroDataWriter(dir: String, avroJson: String,
                                      schema: StructType, partitionId: Int,
                                      taskId: Long, queryId: String)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val sch = new Schema.Parser().parse(avroJson)
  // queryId in the name: append jobs from different applications can
  // never collide; taskId isolates speculative attempts within a job
  private val tmpPath = new Path(new Path(dir, "_tmp"),
    f"tmp-part-$queryId%s-$partitionId%05d-$taskId.avro")
  private val fs = tmpPath.getFileSystem(new Configuration())
  private val out = fs.create(tmpPath, true)
  private val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
  writer.create(sch, out)

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(sch)
    var c = 0
    while (c < schema.length) {
      rec.put(c,
        if (row.isNullAt(c)) null
        else schema(c).dataType match {
          case StringType => row.getUTF8String(c).toString
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(c))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(c))
          case IntegerType => java.lang.Integer.valueOf(row.getInt(c))
          case LongType => java.lang.Long.valueOf(row.getLong(c))
          case FloatType => java.lang.Float.valueOf(row.getFloat(c))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(c))
          case other => throw new IllegalArgumentException(
            s"graft-avro write does not support ${other.catalogString}")
        })
      c += 1
    }
    writer.append(rec): Unit
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writer.close()
    AvroCommitMessage(tmpPath.toString)
  }

  override def abort(): Unit = {
    scala.util.Try(writer.close())
    fs.delete(tmpPath, false): Unit
  }

  override def close(): Unit = ()
}

private[sources] class AvroScanBuilder(files: Seq[String], full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(files, required)
}

private[sources] case class AvroFilePartition(file: String,
                                              schema: StructType)
    extends InputPartition

private[sources] class AvroScan(files: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro files=${files.size} cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => AvroFilePartition(f, required): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory
}

private[sources] class AvroReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroFilePartition]
    new AvroFileReader(p.file, p.schema)
  }
}

private[sources] class AvroFileReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = new DataFileReader(
    new FsInput(new Path(file), new Configuration()),
    new GenericDatumReader[GenericRecord]())
  // resolve the pruned columns against the WRITER schema by name once —
  // reading a projection never materializes the other columns' values
  // beyond avro's own decode
  private val positions = {
    val writer = reader.getSchema
    required.fields.map { f =>
      val af = writer.getField(f.name)
      require(af != null, s"graft-avro: column '${f.name}' not in $file")
      (af.pos(), f.dataType)
    }
  }
  override def next(): Boolean = reader.hasNext
  override def get(): InternalRow = {
    val rec = reader.next()
    InternalRow.fromSeq(positions.toSeq.map { case (pos, dt) =>
      rec.get(pos) match {
        case null => null
        case cs: CharSequence if dt == StringType =>
          UTF8String.fromString(cs.toString)
        case bb: java.nio.ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case v => v
      }
    })
  }
  override def close(): Unit = reader.close()
}
