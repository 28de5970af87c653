package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WORD-EMBEDDING TRAINING as relational operators — the §2.9 seed the
  * reference ships as ml/feature/Word2Vec.scala:121 (skip-gram trained by
  * SGD). SGD is nondeterministic by construction (seeded init, shared-state
  * updates), so a DuckDB-replayable engine operator trains the CLOSED-FORM
  * equivalent instead: Levy & Goldberg (NeurIPS 2014) showed skip-gram with
  * negative sampling implicitly factorizes the shifted PPMI matrix, and the
  * explicit PPMI rows are themselves a strong word representation (their
  * "explicit vector space"). The trainer here is
  *
  *   windowed co-occurrence → PPMI → (a) explicit vectors over the top-D
  *   context dims, (b) the dominant PPMI direction via a FIXED-iteration
  *   power method (the first SVD factor, pinned like q_graph_* so an
  *   external engine replays it bit-for-bit),
  *
  * every stage a join/aggregate:
  *
  *  - co-occurrence is an EQUI-join: positions join on (doc, pos + k) with
  *    k exploded over 1..window — W× the token count, never the per-doc
  *    len² blow-up a range-condition self-join would plan;
  *  - PPMI is arithmetic over three aggregates of the pair table, all
  *    integer counts until one final log — cross-engine exact;
  *  - the matrix is vocabulary²-BOUNDED and sparse (only observed pairs
  *    carry rows); corpus size only raises the counts, so the 100 TB
  *    regime changes scan cost, not state shape;
  *  - the power iteration is the [[Rank.hits]] pattern: matvec = equi-join
  *    + sum, L2 norm broadcast back as a 1-row frame, iteration count
  *    fixed. PPMI ≥ 0 and a positive start keep the iterate nonnegative,
  *    so the eigenvector's sign indeterminacy never appears.
  */
object Embed {

  /** Symmetric windowed co-occurrence counts `(a, b, cab)` over the
    * tokenized corpus: every unordered token pair within `window`
    * positions counts once in each direction (the symmetric context
    * Word2Vec defaults to). Each offset k in 1..window is one equi-join
    * key — no range-join residual anywhere. */
  def cooccurrence(docs: DataFrame, window: Int = 2,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = docs.select(col(idCol).as("did"),
        posexplode(graft.fts.Analyzer.tokenize(col(textCol)))
          .as(Seq("pos", "term")))
    val left = toks.withColumn("k",
      explode(array((1 to window).map(lit(_)): _*)))
    val right = toks.select(col("did").as("rdid"), col("pos").as("rpos"),
      col("term").as("ctx"))
    val pairs = left.join(right,
      left("did") === right("rdid") &&
        right("rpos") === left("pos") + left("k"))
      .select(col("term"), col("ctx"))
    pairs.select(col("term").as("a"), col("ctx").as("b"))
      .union(pairs.select(col("ctx").as("a"), col("term").as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
  }

  /** Positive pointwise mutual information over a co-occurrence table:
    * `w(a,b) = max(0, ln(cab·total / (ca·cb)))`, rounded to 6 so the
    * downstream algebra (and the oracle) consume the same pinned matrix.
    * All marginals are exact integer aggregates of `cooc` itself. */
  def ppmi(cooc: DataFrame): DataFrame = {
    val ca = cooc.groupBy("a").agg(sum(col("cab")).as("ca"))
    val cb = cooc.groupBy("b").agg(sum(col("cab")).as("cb"))
    val total = cooc.agg(sum(col("cab")).as("total"))
    cooc.join(ca, "a").join(cb, "b").crossJoin(broadcast(total))
      .select(col("a"), col("b"),
        round(greatest(lit(0.0),
          log(col("cab").cast("double") * col("total").cast("double") /
            (col("ca").cast("double") * col("cb").cast("double")))),
          6).as("w"))
      .filter(col("w") > 0.0)
  }

  /** Train: explicit PPMI vectors over the `dims` highest-marginal
    * context terms (dim order = context total DESC, term ASC — pinned),
    * plus the dominant PPMI direction after `powerIters` normalized
    * power steps from the all-ones start. Output
    * `(term, vec: array<double>[dims], pc1)`, one row per vocabulary
    * term, ordered. Vocabulary-sized everywhere after the count stage. */
  def trainPpmiEmbeddings(docs: DataFrame, window: Int = 2, dims: Int = 8,
                          powerIters: Int = 3): DataFrame =
    trainFromCooc(cooccurrence(docs, window), dims, powerIters)

  /** Train from an already-materialized co-occurrence COUNT table
    * `(a, b, cab)` — the incremental entry point: windowed co-occurrence
    * is ADDITIVE across document batches (window pairs never cross
    * document boundaries), so a streaming ingest can append per-batch
    * deltas ([[graft.streaming.StreamEmbed]]) and fold Σcab at serve
    * time; everything from counts to vectors is the identical algebra,
    * so the incrementally-maintained space equals the batch-trained one
    * bit-for-bit. */
  def trainFromCooc(cooc0: DataFrame, dims: Int = 8,
                    powerIters: Int = 3): DataFrame = {
    require(dims >= 1 && powerIters >= 1, "need dims and iterations >= 1")
    val cooc = cooc0.persist()
    val m = ppmi(cooc).persist()
    try {
      // vocabulary and dim ranking off the INTEGER count marginals —
      // exact in both engines (a float PPMI-mass ranking would be
      // summation-order-sensitive and could swap near-tied dims)
      val vocab = cooc.groupBy(col("a").as("term")).agg(sum("cab").as("ca"))
        .persist()
      val dimTable = vocab
        .orderBy(col("ca").desc, col("term")).limit(dims)
        .withColumn("dim_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("ca").desc, col("term"))))
        .select(col("term").as("b"), col("dim_rank"))
      val cells = vocab.select(col("term"))
        .crossJoin(broadcast(dimTable))
        .join(m.withColumnRenamed("a", "term"), Seq("term", "b"), "left")
        .na.fill(0.0, Seq("w"))
      val vecs = cells.groupBy("term")
        .agg(transform(
          array_sort(collect_list(struct(col("dim_rank"), col("w")))),
          e => e.getField("w")).as("vec"))
      // fixed-iteration power method, HITS-normalization shape
      var v = vocab.select(col("term"), lit(1.0).as("v"))
      for (_ <- 1 to powerIters) {
        val raw = m.join(v.withColumnRenamed("term", "b"), "b")
          .groupBy(col("a").as("term")).agg(sum(col("w") * col("v")).as("v"))
        val norm = raw.agg(sqrt(sum(col("v") * col("v"))).as("l2"))
        v = vocab.select(col("term"))
          .join(raw, Seq("term"), "left").na.fill(0.0, Seq("v"))
          .crossJoin(broadcast(norm))
          // an all-zero PPMI matrix (e.g. single-token docs) makes the
          // L2 aggregate null/zero — keep the iterate at 0.0 instead of
          // propagating NULL (cosine's zero-norm rule); engines agree
          .select(col("term"),
            when(col("l2") > 0.0, col("v") / col("l2"))
              .otherwise(lit(0.0)).as("v"))
          .localCheckpoint()
      }
      // materialize the vocabulary-sized result (localCheckpoint) BEFORE
      // releasing the caches — otherwise the unpersists below would force
      // a full cooc/ppmi recompute when the caller finally executes
      val out = vecs.join(v, "term")
        .select(col("term"), col("vec"), round(col("v"), 6).as("pc1"))
        .localCheckpoint()
        .orderBy("term")
      vocab.unpersist()
      out
    } finally { m.unpersist(); cooc.unpersist() }
  }

  /** Cosine similarity between two trained vectors — the neighbor-quality
    * probe the spec uses (and a user's similarity surface over the
    * explicit vectors). Zero-norm vectors score 0. */
  def cosine(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    when(na > 0.0 && nb > 0.0, dot / (na * nb)).otherwise(lit(0.0))
  }
}
