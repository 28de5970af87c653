package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, structured the
  * way production trainers (SentencePiece, HF tokenizers) actually run at
  * corpus scale: training consumes the WORD HISTOGRAM, not the corpus.
  *
  *  - **Train** (distributed → driver): one tokenize + groupBy reduces the
  *    corpus to (word, freq) — vocabulary-sized, millions of rows at
  *    100 TB, and capped here by `maxWords` highest-frequency words (the
  *    standard trainer cut; ties break on the word string so the cap is
  *    deterministic). The classic merge loop then runs on the collected
  *    histogram: pair frequencies are weighted by word freq, the argmax
  *    pair merges, repeat. The loop's cost is |vocab|·numMerges, never
  *    corpus-sized, which is why every real BPE trainer is driver-side
  *    (or single-node) after the histogram reduction.
  *  - **Apply** (distributed): each DISTINCT word is encoded once —
  *    a vocabulary-sized frame, the merge list broadcast in the closure —
  *    and the corpus token stream broadcast-joins word → pieces. The
  *    per-token hot path is a join, not a merge loop; the iterative
  *    encode runs |vocab| times total regardless of corpus size.
  *
  * Pieces use no end-of-word marker; a merge is recorded as "left right"
  * and produces piece "leftright". Both halves are deterministic: merge
  * selection ties break lexicographically on (left, right), so the same
  * corpus always learns the same merge table.
  */
object Bpe {

  /** One BPE encode of `word` under an ordered merge table (merge i =
    * (left, right) → left+right, applied exhaustively in table order —
    * the standard greedy-by-rank BPE; rank order IS priority order). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var pieces: Seq[String] = word.map(_.toString)
    merges.foreach { case (l, r) =>
      var i = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (i < pieces.length) {
        if (i + 1 < pieces.length && pieces(i) == l && pieces(i + 1) == r) {
          out += l + r; i += 2
        } else { out += pieces(i); i += 1 }
      }
      pieces = out.toSeq
    }
    pieces
  }

  /** Learn `numMerges` merges from the corpus's word histogram. Returns
    * the ordered merge table; stops early if no pair occurs twice. */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 100000,
            textCol: String = "text"): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    // distributed reduction: corpus → (word, freq), capped deterministically
    val hist = docs
      .select(explode(graft.fts.Analyzer.tokenize(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // driver merge loop over the histogram (vocab-sized, corpus-free)
    var words: Array[(IndexedSeq[String], Long)] =
      hist.map { case (w, f) => (w.map(_.toString): IndexedSeq[String], f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.size < numMerges && continue) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (ps, f) =>
        var i = 0
        while (i + 1 < ps.length) {
          val k = (ps(i), ps(i + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + f
          i += 1
        }
      }
      val best = pairs.filter(_._2 >= 2)
      if (best.isEmpty) continue = false
      else {
        // argmax by freq, ties lexicographic on (left, right) → deterministic
        val ((l, r), _) = best.toSeq
          .minBy { case ((a, b), f) => (-f, a, b) }
        merges += ((l, r))
        words = words.map { case (ps, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ps.length) {
            if (i + 1 < ps.length && ps(i) == l && ps(i + 1) == r) {
              out += l + r; i += 2
            } else { out += ps(i); i += 1 }
          }
          (out.toIndexedSeq, f)
        }
      }
    }
    merges.toSeq
  }

  /** Encode a token column under a learned merge table: distinct words
    * encode once (vocab-sized work), the token stream joins word → pieces.
    * Input frame must carry `wordCol`; output adds `pieces` (array) and
    * `n_pieces`. The join side is the DISTINCT-word frame — broadcast it
    * when the vocabulary fits (always, for natural-language vocabularies);
    * at extreme vocab sizes drop the hint and it degrades to a shuffle
    * join, still vocab×corpus-token sized, never quadratic. */
  def applyMerges(tokens: DataFrame, merges: Seq[(String, String)],
                  wordCol: String = "word"): DataFrame = {
    val spark = tokens.sparkSession
    val mergesB = spark.sparkContext.broadcast(merges)
    val enc = udf((w: String) => encodeWord(w, mergesB.value))
    val vocab = tokens.select(col(wordCol)).distinct()
      .withColumn("pieces", enc(col(wordCol)))
      .withColumn("n_pieces", size(col("pieces")))
    tokens.join(broadcast(vocab), wordCol)
  }

  /** Tokenized view of a document table: one row per (doc_id, word). */
  def words(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      explode(graft.fts.Analyzer.tokenize(col(textCol))).as("word"))

  /** REAL per-document token counts under a trained merge table:
    * `(idCol, toks)` with toks = Σ n_pieces over the doc's words — the
    * number of tokens a training run over this tokenizer actually
    * consumes, as opposed to [[TextStats.estBpeTokens]]'s closed-form
    * estimate. Same scale shape as [[applyMerges]]: distinct words encode
    * once, the doc→word stream broadcast-joins word → n_pieces, one
    * groupBy(doc) sums. Token-free docs keep a 0 row (left join against
    * the id spine) so budget arithmetic sees every document. */
  def countTokens(docs: DataFrame, merges: Seq[(String, String)],
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val perDoc = applyMerges(words(docs, idCol, textCol), merges)
      .groupBy(col(idCol))
      .agg(sum(col("n_pieces")).cast("bigint").as("toks"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("toks"), lit(0L)).as("toks"))
  }
}
