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
}
