package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Chunking window algebra on hand-computable documents. */
class ChunkingSpec extends SparkSpec {

  private def rows(text: String, size: Int, overlap: Int): Seq[(Int, String, Int)] = {
    import spark.implicits._
    Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"), size, overlap)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq
  }

  test("sliding windows cover every token; last chunk may be short") {
    // 10 tokens, size 4, overlap 1 → stride 3 → starts 0,3,6,9
    val got = rows("a b c d e f g h i j", size = 4, overlap = 1)
    assert(got == Seq(
      (0, "a b c d", 4), (1, "d e f g", 4), (2, "g h i j", 4), (3, "j", 1)))
  }

  test("overlap 0 partitions the tokens exactly") {
    assert(rows("a b c d e", size = 2, overlap = 0) ==
      Seq((0, "a b", 2), (1, "c d", 2), (2, "e", 1)))
  }

  test("short documents yield one chunk; empty token streams yield none") {
    import spark.implicits._
    assert(rows("a b", size = 8, overlap = 2) == Seq((0, "a b", 2)))
    assert(Chunking.chunk(
      Seq((1L, "!!!")).toDF("doc_id", "text"), 8, 2).count() == 0)
  }

  test("tokenization is the frozen grammar (lowercase, punctuation splits)") {
    assert(rows("Big-Data, QUERY!", size = 2, overlap = 0) ==
      Seq((0, "big data", 2), (1, "query", 1)))
  }

  test("invalid size/overlap combinations fail loud") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(df, 0, 0))
    intercept[IllegalArgumentException](Chunking.chunk(df, 4, 4))
    intercept[IllegalArgumentException](Chunking.chunk(df, 4, -1))
  }
}
