package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UNIGRAM-LANGUAGE-MODEL tokenizer (Kudo 2018 — the SentencePiece
  * `unigram` algorithm, the other production tokenizer family beside
  * [[Bpe]]): pieces carry independent probabilities, a word encodes as
  * its maximum-likelihood segmentation (Viterbi), and training is hard-EM
  * over the word histogram — seed a large candidate vocabulary from
  * substring counts, alternate Viterbi segmentation (E) with MLE piece
  * re-estimation (M), then prune to the target size.
  *
  * Scale structure mirrors [[Bpe]] exactly: the DISTRIBUTED phase reduces
  * the corpus to the capped (word, freq) histogram — one tokenize +
  * groupBy, vocabulary-sized; the EM loop runs driver-side over that
  * bounded histogram (|vocab|·maxPieceLen² per iteration, corpus-free —
  * the same economics that make every real trainer single-node after the
  * reduction); apply encodes each DISTINCT word once and broadcast-joins
  * the token stream.
  *
  * Determinism: seed selection ties break on the piece string, Viterbi
  * ties prefer the later split point (first strictly-greater wins while
  * scanning split points ascending), and EM arithmetic is fixed-order
  * driver-side double — the same corpus always learns the same vocab. */
object UnigramLm {

  /** Trained model: pieces with natural-log probabilities, plus the hard-EM
    * Viterbi objective per iteration (freq-weighted total best-path
    * log-likelihood — non-decreasing by the EM argument, asserted in the
    * verification row). */
  final case class Model(logp: Map[String, Double], losses: Seq[Double])

  /** Viterbi maximum-likelihood segmentation of `word` under the piece
    * log-probs. Single characters absent from the vocab get a floor score
    * (min known − 10) so every word segments; longer unknown substrings
    * are impossible. */
  def encodeWord(word: String, logp: Map[String, Double],
                 maxPieceLen: Int = 6): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val n = word.length
    val floor = (if (logp.isEmpty) 0.0 else logp.values.min) - 10.0
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        val lp = logp.getOrElse(piece,
          if (i - j == 1) floor else Double.NegativeInfinity)
        val cand = best(j) + lp
        if (cand > best(i)) { best(i) = cand; back(i) = j }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverse.toSeq
  }

  /** Train a `vocabSize`-piece unigram model from the corpus word
    * histogram. Driver state is bounded throughout: `maxWords` histogram
    * rows, ≤ Σ|word|·maxPieceLen seed candidates capped at `seedSize`. */
  def train(docs: DataFrame, vocabSize: Int, emIters: Int = 2,
            maxPieceLen: Int = 6, seedSize: Int = 2000,
            maxWords: Int = 100000, textCol: String = "text"): Model = {
    require(vocabSize >= 1 && emIters >= 1, "bad training shape")
    val hist = docs
      .select(explode(graft.fts.Analyzer.tokenize(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = hist.flatMap(_._1.map(_.toString)).distinct.sorted
    // seed: substring counts weighted by word freq, capped; single chars
    // always survive (every word must stay segmentable)
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Double]
    hist.foreach { case (w, f) =>
      for (a <- 0 until w.length;
           b <- (a + 1) to math.min(w.length, a + maxPieceLen))
        seedCounts(w.substring(a, b)) =
          seedCounts.getOrElse(w.substring(a, b), 0.0) + f
    }
    val multi = seedCounts.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(seedSize - chars.length)
    var counts: Map[String, Double] =
      (chars.map(c => c -> seedCounts.getOrElse(c, 1.0)) ++ multi).toMap
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    var logp: Map[String, Double] = Map.empty
    def normalize(c: Map[String, Double]): Map[String, Double] = {
      val total = c.values.sum
      c.map { case (p, v) => p -> math.log(v / total) }
    }
    for (_ <- 1 to emIters) {
      logp = normalize(counts)
      val next = scala.collection.mutable.HashMap.empty[String, Double]
      var loss = 0.0
      hist.foreach { case (w, f) =>
        val pieces = encodeWord(w, logp, maxPieceLen)
        loss += f * pieces.map(p =>
          logp.getOrElse(p, logp.values.min - 10.0)).sum
        pieces.foreach(p => next(p) = next.getOrElse(p, 0.0) + f)
      }
      losses += loss
      // unused single chars stay at epsilon so rare words never lose
      // their last-resort segmentation
      counts = (chars.map(c => c -> math.max(next.getOrElse(c, 0.0), 1e-3)) ++
        next.toSeq.filter { case (p, _) => p.length > 1 }).toMap
    }
    // prune: all single chars + the best multi-char pieces by final count
    val keepMulti = counts.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.length))
    Model(normalize((chars.map(c => c -> counts(c)) ++ keepMulti).toMap),
      losses.toSeq)
  }

  /** Encode a token column under a trained model: distinct words encode
    * once (vocab-sized work), the token stream broadcast-joins
    * word → pieces — the [[Bpe.applyMerges]] shape. */
  def applyModel(tokens: DataFrame, model: Model, maxPieceLen: Int = 6,
                 wordCol: String = "word"): DataFrame = {
    val spark = tokens.sparkSession
    val logpB = spark.sparkContext.broadcast(model.logp)
    val enc = udf((w: String) => encodeWord(w, logpB.value, maxPieceLen))
    val vocab = tokens.select(col(wordCol)).distinct()
      .withColumn("pieces", enc(col(wordCol)))
      .withColumn("n_pieces", size(col("pieces")))
    tokens.join(broadcast(vocab), wordCol)
  }
}
