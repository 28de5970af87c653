package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + typed metadata — the multimodal column
  * convention (binary content, struct metadata) for 100 TB pipelines. */
final case class MediaRecord(doc_id: Long, fmt: String, bytes: Array[Byte])

/** Decoded media features. width/height/checksum come from the decode step. */
final case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
                               width: Int, height: Int, checksum: Long)

/** Multimodal-column plumbing. The DECODE STEP IS A STUB: real image/audio
  * decoding needs codec libraries absent from this container, so
  * `decodeStub` derives deterministic fake dimensions from the byte stream.
  * Everything around it — the binary+metadata schema, the typed
  * `mapPartitions` batch shape (one decoder init per partition, stream of
  * records through it, mirroring how a real codec/model would be invoked),
  * and the partitioning — is real and tested.
  */
object Multimodal {

  /** Pack a text table into media shape: payload = UTF-8 bytes (stand-in for
    * image/audio bytes), fmt tag derived from the source column. */
  def toMedia(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      concat(lit("img/"), col("source")).as("fmt"),
      encode(col(textCol), "UTF-8").as("bytes"))

  /** STUB decode — deterministic fake: "dimensions" from byte length,
    * checksum = byte sum mod 2³¹−1. A real deployment swaps the body of
    * `decodeOne` for an actual codec call; the surrounding per-partition
    * batching is exactly what that call would need. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would happen here (codec/model handle)
      it.map(decodeOne)
    }
  }

  /** The one stub hash: rolling (h·31 + byte) mod 2³¹−1 over a byte range —
    * shared by whole-payload checksums and frame checksums so the two can
    * never drift (both oracles re-derive this exact formula). */
  private[pipeline] def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = (h * 31 + (bytes(i) & 0xff)) % 2147483647L; i += 1 }
    h
  }

  private[pipeline] def decodeOne(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length.toLong
    val checksum = hashRange(r.bytes, 0, r.bytes.length)
    val width = (n % 64 + 1).toInt * 16
    val height = (n % 48 + 1).toInt * 16
    MediaFeatures(r.doc_id, r.fmt, n, width, height, checksum)
  }

  /** End-to-end: documents → media records → decoded features DataFrame. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeStub(toMedia(docs).as[MediaRecord]).toDF()
  }

  /** Frame sampling over a "video" payload: frame i covers bytes
    * [i·stride, i·stride + frameLen) and yields a rolling checksum — the
    * shape of real frame extraction (fixed-stride sampling, bounded window
    * per frame, one row out per frame via flatMap inside mapPartitions so a
    * real codec handle initializes once per partition). The per-frame
    * "decode" is the same documented stub as [[decodeOne]]. */
  def sampleFrames(media: Dataset[MediaRecord], frameLen: Int = 256,
                   stride: Int = 512): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would happen here (codec handle)
      it.flatMap { r =>
        val n = r.bytes.length
        Iterator.range(0, n, stride).zipWithIndex.map { case (off, idx) =>
          FrameSample(r.doc_id, idx, hashRange(r.bytes, off, math.min(off + frameLen, n)))
        }
      }
    }
  }

  /** RESIZE stage: stride-downsample the payload to ≤ `target` bytes
    * (stride k = ⌈n/target⌉, keep bytes 0, k, 2k, …) — the deterministic
    * stand-in for an image resample (a real deployment decodes, resamples
    * pixels, re-encodes; the sampling/batch shape is identical). Emits the
    * resized size and the stub rolling checksum over the KEPT bytes so the
    * oracle can recompute the exact resampled content. */
  def resize(media: Dataset[MediaRecord], target: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition resampler init would happen here
      it.map { r =>
        val n = r.bytes.length
        val k = math.max(1, math.ceil(n.toDouble / target).toInt)
        var h = 0L
        var cnt = 0
        var i = 0
        while (i < n) {
          h = (h * 31 + (r.bytes(i) & 0xff)) % 2147483647L
          cnt += 1
          i += k
        }
        ResizedMedia(r.doc_id, n.toLong, cnt, h)
      }
    }
  }
}

/** One sampled frame: which doc, which frame slot, stub checksum. */
final case class FrameSample(doc_id: Long, frame_idx: Int, checksum: Long)

/** A resized payload: original size, kept-byte count, stub checksum. */
final case class ResizedMedia(doc_id: Long, n_in: Long, n_out: Int, checksum: Long)

/** Extracted feature vector: a 16-bin byte histogram per media payload. */
final case class MediaHistogram(doc_id: Long, hist: Array[Long])

object MultimodalFeatures {
  /** FEATURE-EXTRACT stage: a fixed-width histogram over the payload bytes
    * (bin = byte mod 16) through the same per-partition batch shape as the
    * decode stub — where a real pipeline would run an embedding model or
    * feature net over the decoded media, this runs the cheapest possible
    * stand-in whose output an oracle can recompute exactly. One row in,
    * one fixed-length vector out: the shape that feeds the embedding
    * column workflows (similarity, quantization) upstream of this file. */
  def byteHistogram(media: Dataset[MediaRecord]): Dataset[MediaHistogram] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition model/codec init would happen here
      it.map { r =>
        val h = new Array[Long](16)
        var i = 0
        while (i < r.bytes.length) { h((r.bytes(i) & 0xff) % 16) += 1; i += 1 }
        MediaHistogram(r.doc_id, h)
      }
    }
  }
}
