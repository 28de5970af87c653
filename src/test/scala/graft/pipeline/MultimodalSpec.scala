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
