package graft.pipeline

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
}
