package graft.pipeline

// (pixel/aHash tests appended at the bottom of this suite)

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("decodeOne is deterministic and length-derived") {
    val r = Multimodal.decodeOne(MediaRecord(7L, "img/src1", "abcd".getBytes("UTF-8")))
    assert(r.n_bytes == 4)
    assert(r.width == (4 % 64 + 1) * 16)
    assert(r.height == (4 % 48 + 1) * 16)
    // checksum: fold (h*31 + byte) mod p over 'a','b','c','d'
    val expected = "abcd".getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 2147483647L)
    assert(r.checksum == expected)
  }

  test("imageDims parses real PNG/JPEG/GIF headers and rejects junk") {
    assert(Multimodal.imageDims(Multimodal.pngBytes(640, 480)) ==
      Some(("png", 640, 480)))
    // JPEG walks APP0+DQT before reaching SOF0; dims are (height, width)
    // inside the segment but returned as (width, height)
    assert(Multimodal.imageDims(Multimodal.jpegBytes(1024, 768)) ==
      Some(("jpeg", 1024, 768)))
    // GIF logical screen is little-endian
    assert(Multimodal.imageDims(Multimodal.gifBytes(300, 7)) ==
      Some(("gif", 300, 7)))
    // big dims exercise the multi-byte paths
    assert(Multimodal.imageDims(Multimodal.pngBytes(65535, 1)) ==
      Some(("png", 65535, 1)))
    assert(Multimodal.imageDims(Multimodal.gifBytes(65535, 43210)) ==
      Some(("gif", 65535, 43210)))
    // junk, truncation, and a JPEG whose marker chain never yields SOF
    assert(Multimodal.imageDims("not an image".getBytes).isEmpty)
    assert(Multimodal.imageDims(Multimodal.pngBytes(10, 10).take(12)).isEmpty)
    assert(Multimodal.imageDims(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).isEmpty)
    assert(Multimodal.imageDims(Array.empty[Byte]).isEmpty)
  }

  test("headerDims surfaces unknown payloads loudly instead of dropping") {
    val sparkS = spark
    import sparkS.implicits._
    val media = Seq(
      MediaRecord(1L, "synth", Multimodal.synthImage(1L)),
      MediaRecord(2L, "synth", "garbage".getBytes)).toDS()
    val out = Multimodal.headerDims(media).collect().sortBy(_.doc_id)
    assert(out(0).fmt == "jpeg" && out(0).width == 2 && out(0).height == 2)
    assert(out(1) == MediaDims(2L, "unknown", -1, -1))
  }

  test("wavInfo chunk-walks real RIFF containers") {
    // synthWav(4): 16 kHz mono, 5 samples
    assert(Multimodal.wavInfo(Multimodal.synthWav(4L)) ==
      Some((16000, 1, 16, 5L)))
    // synthWav(7): 44.1 kHz stereo, 8 samples
    assert(Multimodal.wavInfo(Multimodal.synthWav(7L)) ==
      Some((44100, 2, 16, 8L)))
    // junk / truncated / a RIFF that never reaches a data chunk
    assert(Multimodal.wavInfo("RIFFxxxx".getBytes).isEmpty)
    assert(Multimodal.wavInfo(Multimodal.synthWav(4L).take(20)).isEmpty)
    assert(Multimodal.wavInfo(Array.empty[Byte]).isEmpty)
  }

  test("pcmSamples decodes the synthWavPcm waveform byte-exactly") {
    // synthWavPcm(5): stereo, 6 frames; sample (s, c) = ((5*31+s*7+c*13) % 2048) - 1024
    val Some((ch, samples)) = Multimodal.pcmSamples(Multimodal.synthWavPcm(5L))
    assert(ch == 2 && samples.length == 12)
    for (s <- 0 until 6; c <- 0 until 2)
      assert(samples(s * 2 + c) == ((5 * 31 + s * 7 + c * 13) % 2048) - 1024)
    // negative samples round-trip through the LE int16 encoding
    assert(samples.exists(_ < 0))
    // junk and zero-filled-data wavs decode too (zeros), corrupt rejects
    assert(Multimodal.pcmSamples(Multimodal.synthWav(4L)).exists(_._2.forall(_ == 0)))
    assert(Multimodal.pcmSamples("RIFFxxxx".getBytes).isEmpty)
  }

  test("audioZcr counts per-channel sign flips, pools channels, clips edge windows") {
    import spark.implicits._
    // synthWavPcm(5): stereo, 6 frames, sample(s,c) = ((155+7s+13c)%2048)-1024
    val media = Seq(MediaRecord(5L, "wav", Multimodal.synthWavPcm(5L))).toDS()
    val r = Multimodal.audioZcr(media, window = 4).collect()
      .map(x => x.getInt(1) -> x.getDouble(2)).toMap
    def v(s: Int, c: Int) = ((5 * 31 + s * 7 + c * 13) % 2048) - 1024
    def zcrOf(lo: Int, hi: Int): Double = {
      val crossings = (for (s <- lo + 1 until hi; c <- 0 until 2
                            if v(s - 1, c).toLong * v(s, c) < 0) yield 1).size
      math.rint(crossings.toDouble / (2 * (hi - lo - 1)) * 1e4) / 1e4
    }
    assert(r == Map(0 -> zcrOf(0, 4), 1 -> zcrOf(4, 6)), r.toString)
    // a single-frame tail window has no pairs → 0.0, not a divide error
    val one = Seq(MediaRecord(0L, "wav", Multimodal.synthWavPcm(0L))).toDS()
    val r1 = Multimodal.audioZcr(one).collect() // doc 0: 1 frame total
    assert(r1.length == 1 && r1(0).getInt(1) == 0 && r1(0).getDouble(2) == 0.0)
    // junk payloads surface as window −1 (the audioRms contract)
    val junk = Seq(MediaRecord(9L, "wav", "nope".getBytes)).toDS()
    assert(Multimodal.audioZcr(junk).collect()(0).getInt(1) == -1)
  }

  test("imageDHash encodes gradient signs; brightness shifts leave it fixed") {
    import spark.implicits._
    def ppm(gray: (Int, Int) => Int): Array[Byte] = {
      val header = "P6\n16 16\n255\n".getBytes("US-ASCII")
      val data = new Array[Byte](16 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 16; ch <- 0 until 3)
        data((y * 16 + x) * 3 + ch) = gray(x, y).toByte
      header ++ data
    }
    val media = Seq(
      MediaRecord(1L, "ppm", ppm((x, _) => x * 8)),        // left-to-right ramp
      MediaRecord(2L, "ppm", ppm((x, _) => 120 - x * 8)),  // reversed ramp
      MediaRecord(3L, "ppm", ppm((x, _) => x * 8 + 50)),   // ramp, +50 brightness
      MediaRecord(4L, "ppm", "junk".getBytes)
    ).toDS()
    val r = Multimodal.imageDHash(media).collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(3), x.getInt(4),
        x.getInt(5), x.getInt(6))).toMap
    // strictly increasing gradients → all 56 bits set (four 0x3fff bands)
    assert(r(1L) == (16, 0x3fff, 0x3fff, 0x3fff, 0x3fff), r(1L).toString)
    // reversed ramp → no bit set
    assert(r(2L) == (16, 0, 0, 0, 0))
    // constant brightness shift never flips a gradient sign
    assert(r(3L) == r(1L))
    // undecodable payloads surface loudly
    assert(r(4L)._1 == -1)
  }

  test("features pipeline preserves row count and schema") {
    val docs = spark.read.parquet(sf("documents"))
    val f = Multimodal.features(spark, docs)
    assert(f.columns.toSeq == Seq("doc_id", "fmt", "n_bytes", "width", "height", "checksum"))
    assert(f.count() == docs.count())
  }

  test("resize keeps every k-th byte and bounds the output size") {
    import spark.implicits._
    val payload = ("x" * 130).zipWithIndex
      .map { case (_, i) => ('a' + i % 26).toChar }.mkString
    val media = Seq(
      MediaRecord(1L, "img/a", payload.getBytes("UTF-8")), // k=3 → 44 bytes
      MediaRecord(2L, "img/b", "ab".getBytes("UTF-8")),    // under target: k=1
      MediaRecord(3L, "img/c", Array.emptyByteArray)       // empty payload
    ).toDS()
    val r = Multimodal.resize(media, target = 64).collect()
      .map(x => x.doc_id -> x).toMap
    assert(r(1L).n_in == 130 && r(1L).n_out == 44 && r(1L).n_out <= 64)
    val kept = payload.getBytes("UTF-8").indices.collect {
      case i if i % 3 == 0 => payload.getBytes("UTF-8")(i)
    }
    val expected = kept.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 2147483647L)
    assert(r(1L).checksum == expected)
    assert(r(2L).n_out == 2 && r(3L).n_out == 0 && r(3L).checksum == 0L)
  }

  test("ppm parse↔generate: decoded pixels equal the generator formula") {
    val bytes = Multimodal.synthPpm(7L)
    val Some((w, h, px)) = Multimodal.ppmPixels(bytes)
    assert(w == 16 && h == 16 && px.length == 256)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(px(y * 16 + x) == (7 * 7 + x * 13 + y * 31 + x * y * 2) % 256,
        s"pixel ($x,$y)")
    // the spiked variant brightens exactly the top-left 2x2 block
    val Some((_, _, px2)) = Multimodal.ppmPixels(Multimodal.synthPpm(107L))
    for (y <- 0 until 16; x <- 0 until 16) {
      val base = (7 * 7 + x * 13 + y * 31 + x * y * 2) % 256
      val want = if (x < 2 && y < 2) math.min(255, base + 40) else base
      assert(px2(y * 16 + x) == want, s"spiked pixel ($x,$y)")
    }
    // comments + arbitrary whitespace parse per the spec
    val wsHeader = "P6 #c\n 2\t1 #z\n 255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    assert(Multimodal.ppmPixels(wsHeader).contains((2, 1, Array(20, 50))) ||
      Multimodal.ppmPixels(wsHeader).exists { case (w2, h2, p2) =>
        w2 == 2 && h2 == 1 && p2.sameElements(Array(20, 50)) })
    // corrupt shapes surface as None, never a crash
    assert(Multimodal.ppmPixels("P5\n1 1\n255\n".getBytes).isEmpty)
    assert(Multimodal.ppmPixels("P6\n4 4\n255\nxy".getBytes).isEmpty) // truncated
    assert(Multimodal.ppmPixels("P6\n1 1\n65535\n".getBytes).isEmpty)
    assert(Multimodal.ppmPixels(Array.emptyByteArray).isEmpty)
  }

  test("aHash: planted near-dups pair within 3 bits, distinct bases do not") {
    import spark.implicits._
    val media = spark.range(200).as[Long]
      .map(id => MediaRecord(id, "ppm", Multimodal.synthPpm(id)))
    val hashes = Multimodal.imageAHash(media).collect()
    assert(hashes.length == 200 && hashes.forall(_.getInt(1) == 16))
    val pairs = Multimodal.nearDupImagePairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 100 }
    assert(planted.length == 100,
      s"all 100 planted (i, i+100) pairs must verify <= 3 bits; got ${planted.length}")
    val cross = pairs.filterNot { case (a, b, _) => b == a + 100 }
    assert(cross.length < 20,
      s"distinct bases should rarely collide within 3 bits; got ${cross.length}: ${cross.take(5).toSeq}")
    // an undecodable payload drops out instead of pairing with everything
    val withJunk = media.union(Seq(
      MediaRecord(999L, "ppm", "not a ppm".getBytes)).toDS())
    assert(!Multimodal.nearDupImagePairs(withJunk).collect()
      .exists(r => r.getLong(0) == 999L || r.getLong(1) == 999L))
  }

  test("resizePixels: nearest-neighbor resample equals the formula") {
    import spark.implicits._
    val media = Seq(MediaRecord(0L, "ppm", Multimodal.synthPpm(0L)),
      MediaRecord(150L, "ppm", Multimodal.synthPpm(150L)),
      MediaRecord(999L, "ppm", "junk".getBytes)).toDS()
    val rows = Multimodal.resizePixels(media, 8, 8).collect()
      .map(r => r.getLong(0) -> r).toMap
    // the junk payload drops (loud-None decode contract)
    assert(rows.keySet == Set(0L, 150L))
    // hand-replay the resample for doc 0: gray(2x, 2y) of the generator
    val expect = for (oy <- 0 until 8; ox <- 0 until 8)
      yield (13 * (2 * ox) + 31 * (2 * oy)) % 256
    val meanWant = math.round(expect.sum / 64.0 * 10000) / 10000.0
    val ckWant = expect.zipWithIndex.map { case (g, i) => (i + 1).toLong * g }.sum
    val r0 = rows(0L)
    assert((r0.getInt(1), r0.getInt(2), r0.getInt(3), r0.getInt(4)) ==
      ((16, 16, 8, 8)))
    assert(r0.getDouble(5) == meanWant, s"mean ${r0.getDouble(5)} want $meanWant")
    assert(r0.getLong(6) == ckWant, s"checksum ${r0.getLong(6)} want $ckWant")
    // the brightened (0,0) source pixel of ids >= 100 reaches the output:
    // doc 150's checksum differs from its base-50 rendering at weight 1
    val base50 = Multimodal.resizePixels(
      Seq(MediaRecord(50L, "ppm", Multimodal.synthPpm(50L))).toDS(), 8, 8)
      .collect()(0)
    val g00 = (50 * 7) % 256 // source (0,0) gray of base 50
    val bumped = math.min(255, g00 + 40)
    assert(rows(150L).getLong(6) == base50.getLong(6) - g00 + bumped)
  }
}
