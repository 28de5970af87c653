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

  // ---- REAL header-level decode (no codec library needed) -----------------

  /** Parse (fmt, width, height) from REAL image container headers — PNG
    * IHDR, JPEG SOFn marker walk, GIF logical screen descriptor — straight
    * off the bytes. This is NOT the stub: dimension extraction (the
    * metadata a curation pipeline actually filters on — size cuts, aspect
    * ratios, thumbnail detection) needs only the header grammar, which is
    * pure byte arithmetic; full pixel decode remains the documented stub.
    * Returns None for anything unrecognized or truncated (the caller
    * decides whether that's a filter or an error). */
  def imageDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16be(i: Int) = (u8(i) << 8) | u8(i + 1)
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32be(i: Int) = (u8(i).toLong << 24 | u8(i + 1) << 16 |
      u8(i + 2) << 8 | u8(i + 3)).toInt
    val n = bytes.length
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (n >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      Some(("png", u32be(16), u32be(20)))
    else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) { // JPEG SOI
      // walk the marker chain: FF mm [len16 payload]; SOFn (C0–CF minus
      // C4/C8/CC) carries height at +5, width at +7 inside its segment
      var i = 2
      while (i + 9 < n) {
        if (u8(i) != 0xff) return None
        val m = u8(i + 1)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", u16be(i + 7), u16be(i + 5)))
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else i += 2 + u16be(i + 2)
      }
      None
    } else if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      Some(("gif", u16le(6), u16le(8))) // logical screen is LITTLE-endian
    else None
  }

  /** Header decode over a media frame — same per-partition batch shape as
    * the stub decode (a real pixel decoder would init here), but the
    * dimensions are REAL parses of the container headers. Unrecognized
    * payloads surface as fmt "unknown" with −1 dims (loud in data, never
    * dropped silently). */
  def headerDims(media: Dataset[MediaRecord]): Dataset[MediaDims] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        imageDims(r.bytes) match {
          case Some((f, w, h)) => MediaDims(r.doc_id, f, w, h)
          case None => MediaDims(r.doc_id, "unknown", -1, -1)
        }
      }
    }
  }

  /** Deterministic REAL image fixtures: spec-correct PNG signature+IHDR,
    * a JPEG SOI→APP0→DQT→SOF0→SOS marker chain, or a GIF89a logical
    * screen descriptor, carrying dims derived from the id (width =
    * id%300+1, height = id%200+1 — the formulas the DuckDB oracle
    * replays). Bytes after the parsed header are filler: header parsing
    * never reads them, exactly like real thumbnails vs full payloads. */
  def synthImage(id: Long): Array[Byte] = {
    val w = (id % 300 + 1).toInt
    val h = (id % 200 + 1).toInt
    (id % 3) match {
      case 0 => pngBytes(w, h)
      case 1 => jpegBytes(w, h)
      case _ => gifBytes(w, h)
    }
  }

  private def be32(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

  private[pipeline] def pngBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0) // bit depth/color/CRC filler

  private[pipeline] def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++                  // SOI
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++    // APP0/JFIF
      "JFIF".getBytes ++ Array.fill[Byte](10)(0) ++
      Array[Byte](0xff.toByte, 0xdb.toByte) ++ be16(67) ++    // DQT
      Array.fill[Byte](65)(1) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++    // SOF0
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 0x11, 0) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)                   // EOI

  private[pipeline] def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)

  /** Parse (sample_rate, channels, bits, n_samples) from a REAL WAV/RIFF
    * header — the audio companion to [[imageDims]]: chunk-walk the RIFF
    * container ("RIFF" size "WAVE", then "fmt " and "data" chunks, all
    * little-endian), derive duration as n_samples = data_bytes /
    * block_align. Header grammar only; sample decode stays the stub. */
  def wavInfo(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i).toLong | u8(i + 1).toLong << 8 |
      u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24
    def tag(i: Int, t: String) = t.indices.forall(j => bytes(i + j) == t(j).toByte)
    val n = bytes.length
    if (n < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // rate, ch, bits, blockAlign
    var dataBytes = -1L
    while (i + 8 <= n && (fmt.isEmpty || dataBytes < 0)) {
      val size = u32(i + 4)
      if (tag(i, "fmt ") && i + 24 <= n)
        fmt = Some((u32(i + 12).toInt, u16(i + 10), u16(i + 22), u16(i + 20)))
      else if (tag(i, "data")) dataBytes = size
      // chunks are word-aligned; a corrupt size must not stall or wrap
      // the walk — unrecognized payloads surface as None, never a hang.
      val next = i.toLong + 8L + size + (size & 1L)
      if (size < 0 || next <= i || next > Int.MaxValue) return None
      i = next.toInt
    }
    fmt.flatMap { case (rate, ch, bits, ba) =>
      if (dataBytes < 0 || ba <= 0) None
      else Some((rate, ch, bits, dataBytes / ba))
    }
  }

  /** Deterministic REAL WAV fixture: canonical RIFF/WAVE with a fmt chunk
    * and a data chunk sized for `nSamples` frames — rate/channels/samples
    * derived from the id by the formulas the oracle replays. */
  def synthWav(id: Long): Array[Byte] = {
    val rate = if (id % 2 == 0) 16000 else 44100
    val ch = (id % 2 + 1).toInt
    val bits = 16
    val nSamples = id % 1000 + 1
    val ba = ch * bits / 8
    val dataLen = (nSamples * ba).toInt
    def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    "RIFF".getBytes ++ le32(36L + dataLen) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(ch) ++ le32(rate) ++ le32(rate.toLong * ba) ++
      le16(ba) ++ le16(bits) ++
      "data".getBytes ++ le32(dataLen) ++ new Array[Byte](dataLen)
  }

  /** [[synthWav]] with REAL PCM content: the data chunk carries 16-bit LE
    * interleaved samples v(id, frame, ch) = ((id·31 + frame·7 + ch·13)
    * mod 2048) − 1024 — a deterministic waveform both engines can derive
    * in closed form, so feature extraction over the BYTES (a real parse)
    * is oracle-checkable against the generator formula (the
    * parse↔generate loop the image fixtures use). */
  def synthWavPcm(id: Long): Array[Byte] = {
    val rate = if (id % 2 == 0) 16000 else 44100
    val ch = (id % 2 + 1).toInt
    val bits = 16
    val nSamples = (id % 1000 + 1).toInt
    val ba = ch * bits / 8
    val dataLen = nSamples * ba
    def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val data = new Array[Byte](dataLen)
    var s = 0
    while (s < nSamples) {
      var c = 0
      while (c < ch) {
        val v = (((id * 31 + s * 7 + c * 13) % 2048) - 1024).toInt
        val off = (s * ch + c) * 2
        data(off) = v.toByte
        data(off + 1) = (v >> 8).toByte
        c += 1
      }
      s += 1
    }
    "RIFF".getBytes ++ le32(36L + dataLen) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(ch) ++ le32(rate) ++ le32(rate.toLong * ba) ++
      le16(ba) ++ le16(bits) ++
      "data".getBytes ++ le32(dataLen) ++ data
  }

  /** Decode the 16-bit PCM frames of a WAV payload: chunk-walk to the data
    * chunk, read little-endian int16 interleaved samples. Returns
    * (channels, samples in frame-major interleaved order), None when the
    * container or sample format is unrecognized. */
  def pcmSamples(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i).toLong | u8(i + 1).toLong << 8 |
      u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24
    def tag(i: Int, t: String) = t.indices.forall(j => bytes(i + j) == t(j).toByte)
    val n = bytes.length
    if (n < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var ch = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= n && (ch < 0 || dataOff < 0)) {
      val size = u32(i + 4)
      if (tag(i, "fmt ") && i + 24 <= n) { ch = u16(i + 10); bits = u16(i + 22) }
      else if (tag(i, "data")) { dataOff = i + 8; dataLen = size.toInt }
      // same corrupt-size guard as wavInfo: never stall, never wrap.
      val next = i.toLong + 8L + size + (size & 1L)
      if (size < 0 || next <= i || next > Int.MaxValue) return None
      i = next.toInt
    }
    if (ch <= 0 || bits != 16 || dataOff < 0 || dataLen < 0 ||
        dataOff.toLong + dataLen > n) return None
    val out = new Array[Int](dataLen / 2)
    var j = 0
    while (j < out.length) {
      out(j) = (u8(dataOff + 2 * j) | (u8(dataOff + 2 * j + 1) << 8)).toShort.toInt
      j += 1
    }
    Some((ch, out))
  }

  /** Windowed RMS energy over a WAV payload's decoded PCM — the canonical
    * audio feature-extract (silence detection, VAD pre-filtering, loudness
    * normalization all start here). Window `w` counts FRAMES; channels
    * pool into the window's RMS. Pure per-row work in the one-decoder-
    * per-partition mapPartitions shape; emits (doc_id, win, rms) with
    * rms = √(Σv²/count) rounded to 4 dp (one exact integer sum, one
    * double divide, one sqrt — engine-reproducible). Unrecognized
    * payloads surface loudly as window −1. */
  def audioRms(media: Dataset[MediaRecord], window: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        pcmSamples(r.bytes) match {
          case Some((ch, samples)) =>
            val frames = samples.length / ch
            (0 until (frames + window - 1) / window).map { w =>
              val from = w * window * ch
              val until = math.min(frames, (w + 1) * window) * ch
              var sumsq = 0L; var i = from
              while (i < until) { sumsq += samples(i).toLong * samples(i); i += 1 }
              val rms = math.sqrt(sumsq.toDouble / (until - from))
              // HALF_UP like Spark's round() and DuckDB's round()
              (r.doc_id, w, BigDecimal(rms)
                .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
                .toDouble)
            }
          case None => Seq((r.doc_id, -1, -1.0))
        }
      }
    }.toDF("doc_id", "win", "rms")
  }

  /** Windowed ZERO-CROSSING RATE over decoded PCM — with [[audioRms]] the
    * other half of the classic VAD/voiced-unvoiced feature pair (high
    * energy + low ZCR ≈ voiced speech; low energy + high ZCR ≈ fricatives
    * or noise). Crossings are counted PER CHANNEL between consecutive
    * frames inside the window (a sign flip is `prev * cur < 0`, so exact
    * zeros never cross), pooled across channels:
    * `zcr = crossings / (channels * (frames_in_window - 1))`, rounded to
    * 4 dp; a window with a single frame has no pairs and reports 0.0.
    * Same one-decoder-per-partition mapPartitions shape as [[audioRms]];
    * unrecognized payloads surface loudly as window −1. */
  def audioZcr(media: Dataset[MediaRecord], window: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        pcmSamples(r.bytes) match {
          case Some((ch, samples)) =>
            val frames = samples.length / ch
            (0 until (frames + window - 1) / window).map { w =>
              val lo = w * window
              val hi = math.min(frames, (w + 1) * window)
              val zcr =
                if (hi - lo < 2) 0.0
                else {
                  var crossings = 0L
                  var s = lo + 1
                  while (s < hi) {
                    var c = 0
                    while (c < ch) {
                      val prev = samples((s - 1) * ch + c)
                      val cur = samples(s * ch + c)
                      if (prev.toLong * cur < 0) crossings += 1
                      c += 1
                    }
                    s += 1
                  }
                  crossings.toDouble / (ch.toLong * (hi - lo - 1))
                }
              (r.doc_id, w, BigDecimal(zcr)
                .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
                .toDouble)
            }
          case None => Seq((r.doc_id, -1, -1.0))
        }
      }
    }.toDF("doc_id", "win", "zcr")
  }

  /** Header decode for audio payloads — unrecognized ones surface loudly
    * as rate −1, like [[headerDims]]. */
  def audioInfo(media: Dataset[MediaRecord]): Dataset[AudioInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        wavInfo(r.bytes) match {
          case Some((rate, ch, bits, ns)) =>
            AudioInfo(r.doc_id, rate, ch, bits, ns)
          case None => AudioInfo(r.doc_id, -1, -1, -1, -1L)
        }
      }
    }
  }

  /** Deterministic REAL PPM (P6) fixture with PIXEL CONTENT — image-content
    * parity with [[synthWavPcm]]: a 16×16 grayscale-RGB raster whose gray
    * value is the closed form
    * g(b, x, y) = (b·7 + x·13 + y·31 + x·y·(b mod 5)) mod 256
    * with b = id mod 100 — the x·y term gives each base a DISTINCT spatial
    * structure (a pure per-base offset would shift cell averages and the
    * mean together, leaving the threshold pattern nearly shift-invariant
    * across bases); ids i and i+100 render the SAME base image;
    * ids ≥ 100 additionally brighten the top-left 2×2 pixel block by +40
    * (capped 255) — a small perturbation that makes (i, i+100) a planted
    * NEAR-duplicate pair under a perceptual hash while distinct bases stay
    * far apart. Both engines can derive every byte from the formula, so
    * pixel decode and hashing over the BYTES (a real parse) are
    * oracle-checkable — the parse↔generate loop. */
  def synthPpm(id: Long): Array[Byte] = {
    val w = 16; val h = 16
    val base = id % 100
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val data = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var g = ((base * 7 + x * 13 + y * 31 + x * y * (base % 5)) % 256).toInt
        if (id >= 100 && x < 2 && y < 2) g = math.min(255, g + 40)
        val off = (y * w + x) * 3
        data(off) = g.toByte; data(off + 1) = g.toByte; data(off + 2) = g.toByte
        x += 1
      }
      y += 1
    }
    header ++ data
  }

  /** REAL pixel resize (nearest-neighbor box sampling) over decoded PPM
    * pixels — the downscale step a multimodal pipeline runs before
    * feature extraction, upgrading the byte-stride [[resize]] stub
    * (which stays for unrecognized containers): out(x, y) =
    * gray(⌊x·w/outW⌋, ⌊y·h/outH⌋). Emits the source/target dims, the
    * 4-dp mean of the RESIZED grays, and an order-sensitive weighted
    * checksum Σ (y·outW+x+1)·g over the resized stream — every number
    * derivable in closed form from the parse↔generate formula, so the
    * oracle replays the resample exactly. Undecodable payloads drop
    * (same loud-None contract as [[imageAHash]]). */
  def resizePixels(media: Dataset[MediaRecord], outW: Int = 8,
                   outH: Int = 8): DataFrame = {
    require(outW >= 1 && outH >= 1, "target dims must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      ppmPixels(r.bytes).map { case (w, h, px) =>
        var sum = 0L
        var wsum = 0L
        var oy = 0
        while (oy < outH) {
          var ox = 0
          while (ox < outW) {
            val g = px((oy * h / outH) * w + (ox * w / outW))
            sum += g
            wsum += (oy * outW + ox + 1).toLong * g
            ox += 1
          }
          oy += 1
        }
        (r.doc_id, w, h, outW, outH, sum, wsum)
      }
    }.toDF("doc_id", "in_w", "in_h", "out_w", "out_h", "sum_g", "checksum")
      .select(col("doc_id"), col("in_w"), col("in_h"), col("out_w"),
        col("out_h"),
        round(col("sum_g").cast("double") / (outW * outH).toDouble, 4)
          .as("mean_gray"),
        col("checksum"))
  }

  /** Decode an uncompressed binary PPM (P6): header `P6 <w> <h> <maxval>`
    * in ASCII with whitespace separators, then w·h RGB byte triples.
    * Returns (w, h, gray pixels row-major) with gray = ⌊(r+g+b)/3⌋; None
    * when the container is unrecognized, truncated, or maxval ≠ 255 —
    * same loud-None contract as [[wavInfo]]/[[pcmSamples]]. */
  def ppmPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val n = bytes.length
    if (n < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var go = true
      while (go && i < n) {
        val c = bytes(i).toChar
        if (c.isWhitespace) { i += 1; progressed = true }
        else if (c == '#') { // comment to end of line, per the PPM spec
          while (i < n && bytes(i) != '\n') i += 1
          progressed = true
        } else go = false
      }
      progressed
    }
    def readInt(): Int = {
      if (!skipWs()) return -1
      var v = 0L; var any = false
      while (i < n && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv != 255) return None
    i += 1 // exactly ONE whitespace byte after maxval, per the spec
    val need = w.toLong * h * 3
    if (need > Int.MaxValue || i + need > n) return None
    val out = new Array[Int](w * h)
    var p = 0
    while (p < out.length) {
      val off = i + p * 3
      out(p) = ((bytes(off) & 0xff) + (bytes(off + 1) & 0xff) +
        (bytes(off + 2) & 0xff)) / 3
      p += 1
    }
    Some((w, h, out))
  }

  /** AVERAGE-HASH (aHash) perceptual fingerprint over decoded pixels: the
    * image folds to an 8×8 grid of cell averages (box filter), each cell
    * contributes bit 1 iff its average EXCEEDS the 64-cell mean, and the
    * 64 bits pack as FOUR 16-bit bands (bit b = cy·8+cx, band k carries
    * bits 16k…16k+15) — band-sliced for the same pigeonhole blocking
    * simhash uses: ≤ 3 differing bits leave at least one of 4 bands
    * identical. All arithmetic is exact across engines: cell sums are
    * integers and the two divisors (cell area, 64) are powers of two at
    * the fixture sizes, so the threshold compare never hits float noise.
    * Emits (doc_id, w, h, mean_gray, b0..b3); undecodable payloads
    * surface loudly as w = −1. */
  def imageAHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        ppmPixels(r.bytes) match {
          case Some((w, h, px)) if w % 8 == 0 && h % 8 == 0 =>
            val cw = w / 8; val chh = h / 8
            val sums = new Array[Long](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sums((y / chh) * 8 + (x / cw)) += px(y * w + x)
                x += 1
              }
              y += 1
            }
            val area = (cw * chh).toDouble
            val avgs = sums.map(_ / area)
            val mean = avgs.sum / 64.0
            val bands = new Array[Int](4)
            var b = 0
            while (b < 64) {
              if (avgs(b) > mean) bands(b / 16) |= 1 << (b % 16)
              b += 1
            }
            val meanGray = BigDecimal(px.sum.toDouble / px.length)
              .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
            (r.doc_id, w, h, meanGray,
              bands(0), bands(1), bands(2), bands(3))
          case _ => (r.doc_id, -1, -1, -1.0, 0, 0, 0, 0)
        }
      }
    }.toDF("doc_id", "width", "height", "mean_gray", "b0", "b1", "b2", "b3")
  }

  /** DIFFERENCE-HASH (dHash, Krawetz) perceptual fingerprint over decoded
    * pixels: where [[imageAHash]] thresholds each cell against the global
    * mean, dHash encodes the sign of each HORIZONTAL cell gradient —
    * bit r·7+c is 1 iff cell (r,c) is strictly darker than cell (r,c+1).
    * Gradients are invariant under global brightness/level shifts and
    * only react to LOCAL structure, the classic complement to aHash's
    * global-contrast sensitivity. Canonical dHash resamples to 9×8; this
    * adaptation keeps the 8×8 exact-integer cell grid (the aHash/fixture
    * invariant: power-of-two cell areas, so cells with equal area compare
    * by integer SUM — no float anywhere), giving 8 rows × 7 gradients =
    * 56 bits packed as FOUR 14-bit bands (bit b → band b/14), preserving
    * the pigeonhole blocking contract: Hamming ≤ 3 ⇒ one band equal.
    * Emits (doc_id, width, height, d0..d3); undecodable payloads surface
    * loudly as width = −1. */
  def imageDHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        ppmPixels(r.bytes) match {
          case Some((w, h, px)) if w % 8 == 0 && h % 8 == 0 =>
            val cw = w / 8; val chh = h / 8
            val sums = new Array[Long](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sums((y / chh) * 8 + (x / cw)) += px(y * w + x)
                x += 1
              }
              y += 1
            }
            val bands = new Array[Int](4)
            var row = 0
            while (row < 8) {
              var c = 0
              while (c < 7) {
                if (sums(row * 8 + c) < sums(row * 8 + c + 1)) {
                  val bit = row * 7 + c
                  bands(bit / 14) |= 1 << (bit % 14)
                }
                c += 1
              }
              row += 1
            }
            (r.doc_id, w, h, bands(0), bands(1), bands(2), bands(3))
          case _ => (r.doc_id, -1, -1, 0, 0, 0, 0)
        }
      }
    }.toDF("doc_id", "width", "height", "d0", "d1", "d2", "d3")
  }

  /** NEAR-DUPLICATE IMAGE pairs by aHash Hamming distance — the image
    * dedup path joining the existing LSH machinery: never all-pairs.
    * Blocking = the 4 hash bands (pigeonhole: Hamming ≤ 3 ⇒ some band
    * equal, so with the default threshold no pair is missed); candidates
    * equi-join on (band index, band value) — corpus-scale cost is the
    * band-bucket join, like simhash — then the exact Hamming verify runs
    * on candidates only (codegen bit_count over the four XORed bands).
    * Returns (a_id, b_id, hamming), a < b. */
  def nearDupImagePairs(media: Dataset[MediaRecord],
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band blocking guarantees completeness only for maxHamming <= 3")
    val hashes = imageAHash(media).filter(col("width") > 0)
      .select("doc_id", "b0", "b1", "b2", "b3")
    val bands = hashes.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "v")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val a = hashes.toDF("a_id", "a0", "a1", "a2", "a3")
    val b = hashes.toDF("b_id", "c0", "c1", "c2", "c3")
    cand.join(a, "a_id").join(b, "b_id")
      .withColumn("hamming",
        bit_count(expr("a0 ^ c0")) + bit_count(expr("a1 ^ c1")) +
          bit_count(expr("a2 ^ c2")) + bit_count(expr("a3 ^ c3")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("int").as("hamming"))
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

/** Header-parsed media dimensions (REAL parse, not the stub). */
final case class MediaDims(doc_id: Long, fmt: String, width: Int, height: Int)

/** Header-parsed audio properties (REAL WAV/RIFF parse, not the stub). */
final case class AudioInfo(doc_id: Long, sample_rate: Int, channels: Int,
                           bits: Int, n_samples: Long)

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
