package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the RAG/embedding-prep step that slices each
  * document into fixed-size token windows with overlap (the sliding-window
  * convention of the common retrieval splitters: chunk c covers token
  * positions [c·stride, c·stride + size), stride = size − overlap, chunks
  * start at every stride multiple below the token count, the final chunk
  * may be short).
  *
  * Scale shape: NO shuffle at all — tokenize (narrow) → explode the
  * per-doc chunk-index sequence (narrow generate, ≤ ⌈len/stride⌉ rows per
  * doc) → slice/join projections. Chunk rows inherit the parent scan's
  * partitioning; a downstream embed/index step sees a corpus-partitioned
  * frame with no repartition needed. The chunk id is deterministic, so
  * (doc_id, chunk_id) is a stable key across re-runs — the property the
  * downstream vector index upserts key on. */
object Chunking {

  /** (idCol, chunk_id, textCol, n_toks) — one row per chunk, empty-token
    * documents contribute no rows. `size` > `overlap` ≥ 0. */
  def chunk(docs: DataFrame, size: Int, overlap: Int = 0,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size >= 1 && overlap >= 0 && overlap < size,
      s"need size >= 1 and 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    docs
      .select(col(idCol), graft.fts.Analyzer.tokenize(col(textCol)).as("t"))
      .withColumn("len", org.apache.spark.sql.functions.size(col("t")))
      .filter(col("len") >= 1)
      .withColumn("chunk_id",
        explode(sequence(lit(0), ((col("len") - 1) / stride).cast("int"))))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("t"), col("chunk_id") * stride + 1, lit(size)), " ")
          .as(textCol),
        least(lit(size), col("len") - col("chunk_id") * stride)
          .cast("int").as("n_toks"))
  }
}
