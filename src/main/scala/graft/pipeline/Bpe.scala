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

  // ---------------------------------------------------------------------
  // WordPiece (Schuster & Nakajima 2012; the BERT tokenizer family) —
  // the THIRD production trainer beside BPE and unigram-LM. Same corpus
  // shape as [[train]] (histogram reduction → driver loop), different
  // merge OBJECTIVE: WordPiece merges the pair maximizing the likelihood
  // gain score freq(ab) / (freq(a)·freq(b)), not raw pair frequency.
  // Continuation pieces carry the '##' marker; serving uses greedy
  // longest-match against the final vocabulary (the real WordPiece
  // apply, not merge replay).
  // ---------------------------------------------------------------------

  /** Learned WordPiece model: the vocabulary (bare word-initial symbols +
    * '##'-marked continuations) and its longest entry (the greedy
    * matcher's scan bound). */
  final case class WordPieceModel(vocab: Set[String], maxLen: Int)

  /** Train `numMerges` WordPiece merges over the capped word histogram.
    * Scores compare as exact integer cross-products (BigInt — no float
    * ties), ties break lexicographically on (left, right); pairs must
    * occur at least twice. Deterministic: same corpus, same model. */
  def trainWordPiece(docs: DataFrame, numMerges: Int,
                     maxWords: Int = 100000,
                     textCol: String = "text"): WordPieceModel = {
    require(numMerges >= 0, "numMerges must be non-negative")
    val hist = docs
      .select(explode(graft.fts.Analyzer.tokenize(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def initial(w: String): IndexedSeq[String] =
      w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c
      }
    var words: Array[(IndexedSeq[String], Long)] =
      hist.map { case (w, f) => (initial(w), f) }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach(_._1.foreach(vocab += _))
    var continue = true
    var done = 0
    while (done < numMerges && continue) {
      val pairF = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symF = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (ps, f) =>
        var i = 0
        while (i < ps.length) {
          symF(ps(i)) = symF.getOrElse(ps(i), 0L) + f
          if (i + 1 < ps.length) {
            val k = (ps(i), ps(i + 1))
            pairF(k) = pairF.getOrElse(k, 0L) + f
          }
          i += 1
        }
      }
      val cands = pairF.filter(_._2 >= 2)
      if (cands.isEmpty) continue = false
      else {
        // argmax of f(ab)/(f(a)·f(b)) via BigInt cross-multiplication:
        // a beats b iff fa·denomB > fb·denomA — exact, no float ties
        val best = cands.toSeq.reduceLeft { (x, y) =>
          val ((xl, xr), xf) = x
          val ((yl, yr), yf) = y
          val lhs = BigInt(xf) * BigInt(symF(yl)) * BigInt(symF(yr))
          val rhs = BigInt(yf) * BigInt(symF(xl)) * BigInt(symF(xr))
          if (lhs > rhs) x
          else if (lhs < rhs) y
          else if (Ordering[(String, String)].lteq((xl, xr), (yl, yr))) x
          else y
        }
        val (l, r) = best._1
        val merged = l + r.stripPrefix("##")
        vocab += merged
        words = words.map { case (ps, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ps.length) {
            if (i + 1 < ps.length && ps(i) == l && ps(i + 1) == r) {
              out += merged; i += 2
            } else { out += ps(i); i += 1 }
          }
          (out.toIndexedSeq, f)
        }
        done += 1
      }
    }
    WordPieceModel(vocab.toSet,
      if (vocab.isEmpty) 1 else vocab.map(_.length).max)
  }

  /** Greedy longest-match WordPiece encode (BERT's WordpieceTokenizer):
    * at each position take the LONGEST vocab entry (continuation
    * positions match against the '##'-marked form); a position with no
    * match collapses the whole word to [UNK] — the standard convention.
    * On the training corpus itself every single char is in-vocab by
    * construction, so [UNK] only fires on out-of-corpus input. */
  def encodeWordPiece(word: String, model: WordPieceModel): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val prefix = if (i == 0) "" else "##"
      var j = math.min(word.length, i + model.maxLen)
      var found: String = null
      while (found == null && j > i) {
        val cand = prefix + word.substring(i, j)
        if (model.vocab.contains(cand)) found = cand else j -= 1
      }
      if (found == null) return Seq("[UNK]")
      out += found
      i = j
    }
    out.toSeq
  }

  /** Encode a token column under a trained WordPiece model — the same
    * distinct-word broadcast-join shape as [[applyMerges]]. */
  def applyWordPiece(tokens: DataFrame, model: WordPieceModel,
                     wordCol: String = "word"): DataFrame = {
    val spark = tokens.sparkSession
    val modelB = spark.sparkContext.broadcast(model)
    val enc = udf((w: String) => encodeWordPiece(w, modelB.value))
    val vocab = tokens.select(col(wordCol)).distinct()
      .withColumn("pieces", enc(col(wordCol)))
      .withColumn("n_pieces", size(col("pieces")))
    tokens.join(broadcast(vocab), wordCol)
  }
}
