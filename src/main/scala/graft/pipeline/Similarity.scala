package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import graft.ext.{DotExpr, LshBucketExpr, LshProjsExpr}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector(s)
  * against a single scan of the corpus, top-k via ORDER BY + LIMIT
  * (TakeOrderedAndProject: per-partition heap, no global sort). The scale
  * path is `annTopK`: random-hyperplane LSH buckets the corpus by sign
  * pattern so a query probes only its own (and adjacent) buckets.
  *
  * All arithmetic in double via the native [[graft.ext.VecKernels]]
  * expressions (one compiled call per row; the declarative
  * `aggregate(zip_with(...))` equivalent costs ~2·dim interpreted lambda
  * evals per row — SCALE.md's "known cost" on a billion-vector corpus).
  * Summation is left-fold in index order, bit-identical to the sequential
  * oracle.
  */
object Similarity {

  private def kcol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftColumnBridge.column(e)
  private def kexp(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftColumnBridge.expression(c)

  def dot(a: Column, b: Column): Column = kcol(DotExpr(kexp(a), kexp(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, NULL when either vector is zero-length in
    * magnitude: a zero vector has no direction, so its similarity is
    * undefined — and under Spark 4's ANSI default the unguarded 0/0 would
    * THROW mid-job, failing a whole corpus-scale stage on one degenerate
    * embedding. NULL drops out of `>= threshold` filters and sorts last
    * under `desc` ranking, which is exactly "near nothing". (DuckDB's /0
    * is NULL, so oracles agree without a guard.) */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0.0, dot(a, b) / d)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** MATRYOSHKA-truncated serving (Kusupati et al. 2022, MRL): rank with
    * only the LEADING `dims` coordinates — cosine renormalizes the
    * truncated vectors implicitly — and audit each truncated-space hit
    * against the full-dimension top-k (`in_full_topk`). With
    * MRL-trained embeddings the leading prefix carries most of the
    * signal, so serving reads `dims/d` of every vector's bytes (the
    * scan-width lever: at 100 TB a 64→16 truncation is a 4× IO cut on
    * the brute-force path and a 4× memory cut on any ANN layout built
    * over the truncated prefix); the audit column measures exactly what
    * that truncation costs on this corpus. Both rankings follow the
    * rounded-score/id contract, so the result replays across engines. */
  def matryoshkaTopK(emb: DataFrame, queryId: Long, k: Int, dims: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, "dims must be positive")
    def tr(c: Column): Column = slice(asDouble(c), 1, dims)
    val q = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qvf"), tr(col(vecCol)).as("qvt"))
      .limit(1)
    val scored = emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(cosine(tr(col(vecCol)), col("qvt")), 4).as("cosim_trunc"),
        round(cosine(asDouble(col(vecCol)), col("qvf")), 4).as("cosim_full"))
    val fullTop = scored
      .orderBy(col("cosim_full").desc, col(idCol)).limit(k)
      .select(col(idCol), lit(true).as("in_full"))
    scored.orderBy(col("cosim_trunc").desc, col(idCol)).limit(k)
      .join(fullTop, Seq(idCol), "left")
      .select(col(idCol), col("cosim_trunc"),
        coalesce(col("in_full"), lit(false)).as("in_full_topk"))
      .orderBy(col("cosim_trunc").desc, col(idCol))
  }

  /** Exact cosine top-k neighbors of the vector with id `queryId`.
    * The 1-row query side is broadcast; ranking is on the rounded score
    * (then id) for cross-engine reproducibility. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // limit(1): a duplicated query id must not fan out candidates via the join
    val q = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv")).limit(1)
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosim", round(cosine(asDouble(col(vecCol)), col("qv")), 4))
      .select(col(idCol), col("cosim"))
      .orderBy(col("cosim").desc, col(idCol))
      .limit(k)
  }

  /** RANGE SEARCH (FAISS `range_search` semantics for cosine): every
    * vector whose rounded cosine to the query reaches `minCosine` — the
    * unbounded-count dual of top-k, the shape dedup radii and "find all
    * near-duplicates of this document" queries want. Exact one-scan form:
    * the 1-row query broadcasts, the corpus is never shuffled, and the
    * result is ordered (cosim desc, id) for reproducibility. The
    * sublinear swap at corpus scale is candidate generation through the
    * LSH/IVF machinery ([[annTopK]]'s buckets / [[ivfTopK]]'s cells) with
    * this same rounded-cosine verify over candidates only — radius
    * contracts then become recall contracts, exactly like top-k ANN. */
  def rangeSearch(emb: DataFrame, queryId: Long, minCosine: Double,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv")).limit(1)
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosim", round(cosine(asDouble(col(vecCol)), col("qv")), 4))
      .filter(col("cosim") >= minCosine)
      .select(col(idCol), col("cosim"))
      .orderBy(col("cosim").desc, col(idCol))
  }

  /** MAXIMAL MARGINAL RELEVANCE rerank (Carbonell & Goldstein, SIGIR
    * 1998): greedily select k results trading relevance against novelty —
    * step i picks argmax over remaining candidates of
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), so near-duplicate hits
    * of an already-selected result are pushed down the page. λ=1 is plain
    * relevance ranking; λ=0 pure diversity.
    *
    * Scale shape: the DISTRIBUTED stage is candidate generation — exact
    * cosine relevance over one corpus scan (broadcast 1-row query) with a
    * TakeOrderedAndProject shortlist (swap in [[annTopK]]/[[ivfTopK]]
    * candidates at corpus scale; MMR only ever needs a serving-sized
    * shortlist). The greedy selection itself is inherently sequential —
    * each step's objective depends on the previous picks — and runs on
    * the driver over the ≤`shortlist` collected rows (the same
    * bounded-literal pattern as the IVF centroid seeds); k·shortlist
    * similarity evaluations, microseconds at serving sizes.
    *
    * Determinism / oracle replay: relevance and pairwise sims round to
    * 9 dp (HALF_UP — SQL round semantics), the objective rounds to 9 dp,
    * ties break on smaller id; sequential IEEE dot products agree
    * bit-for-bit with the SQL oracle's list_dot_product. The first pick's
    * objective is λ·rel (empty-set max sim = 0), so one formula covers
    * every rank. Zero-magnitude vectors have no direction and are
    * excluded from both query and candidates (the cosine() NULL
    * contract). */
  def mmrRerank(emb: DataFrame, queryId: Long, k: Int, lambda: Double,
                shortlist: Int = 100, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && shortlist >= k, s"need 1 <= k <= shortlist")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]")
    require(shortlist <= 100000,
      "MMR is a serving-stage rerank: shortlist is collected to the " +
        "driver — generate candidates with annTopK/ivfTopK first")
    val spark = emb.sparkSession
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv"))
      .filter(dot(col("qv"), col("qv")) > 0).limit(1)
    val cands = emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"),
        round(cosine(asDouble(col(vecCol)), col("qv")), 9).as("rel"))
      .filter(col("rel").isNotNull)
      .orderBy(col("rel").desc, col("id"))
      .limit(shortlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      r9(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val picked = scala.collection.mutable.Set.empty[Long]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var rank = 1
    while (rank <= k && picked.size < cands.length) {
      var bestId = -1L; var bestV: Array[Double] = null; var bestS = Double.NegativeInfinity
      cands.foreach { case (id, v, rel) =>
        if (!picked.contains(id)) {
          val maxSim = if (chosen.isEmpty) 0.0 else chosen.map(cos(v, _)).max
          val s = r9(lambda * rel - (1.0 - lambda) * maxSim)
          if (s > bestS || (s == bestS && id < bestId)) {
            bestS = s; bestId = id; bestV = v
          }
        }
      }
      selected += ((rank, bestId, bestS))
      picked += bestId; chosen += bestV; rank += 1
    }
    import spark.implicits._
    selected.toSeq.toDF("rank", idCol, "mmr")
      .select(col("rank"), col(idCol), round(col("mmr"), 4).as("mmr"))
  }

  /** LSH bucket id: sign pattern of the vector against `planes`
    * deterministic pseudo-random hyperplanes (components derived from
    * xxhash64(p, d) — no shared RNG state across executors), packed into a
    * long. Vectors in the same bucket are likely cosine-close (probability
    * of agreeing on one plane = 1 − θ/π). Native kernel; one call per row. */
  def lshBucket(vec: Column, planes: Int): Column =
    kcol(LshBucketExpr(kexp(vec), planes))

  /** All `planes` hyperplane projections of `vec`, as array<double>. */
  def lshProjs(vec: Column, planes: Int): Column =
    kcol(LshProjsExpr(kexp(vec), planes))

  /** Deterministic CLUSTERED embedding fixture: vector i is cluster
    * (i mod `clusters`)'s pseudo-random center plus `noise`× the original
    * vector. ANN recall contracts need clusterable data — on uniform-random
    * vectors (the raw fixture) recall ≈ fraction of corpus scanned for ANY
    * sublinear method, so the recall test derives this frame first. */
  def clusteredVec(id: Column, vec: Column, clusters: Int = 24,
                   noise: Double = 0.2): Column = {
    val cid = pmod(id, lit(clusters))
    zip_with(asDouble(vec), sequence(lit(0), size(vec) - 1),
      (x, d) => (pmod(xxhash64(lit("center"), cid, d), lit(2000L)).cast("double")
        - 1000.0) / 1000.0 + lit(noise) * x)
  }

  /** Empty (idCol, cosim) result frame — the unknown-query-id contract
    * shared by every top-k serving path. */
  private[graft] def emptyTopK(emb: DataFrame, idCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      emb.schema(idCol),
      org.apache.spark.sql.types.StructField(
        "cosim", org.apache.spark.sql.types.DoubleType)))
    emb.sparkSession.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
  }

  /** Materialize the ≤ k result rows eagerly (the serving path does
    * anyway) so scratch caches can be released in the caller's `finally` —
    * a lazy return would either recompute after unpersist or pin executor
    * memory for the session (round-3 advisory). */
  private def materialize(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** The query's `nprobe` nearest cells (1-based ids) by scaled dot against
    * the centroids — shared by the in-memory and persisted IVF paths. */
  private[graft] def nearestCells(qv: Array[Double], centroids: Seq[Array[Double]],
                                  cNorms: Seq[Double], nprobe: Int): Seq[Int] =
    centroids.zip(cNorms).zipWithIndex
      .map { case ((c, n), i) =>
        (i + 1) -> qv.zip(c).map { case (a, b) => a * b }.sum / n }
      .sortBy(-_._2).take(nprobe).map(_._1)

  /** ANN top-k via query-directed multiprobe LSH: the corpus is bucketed by
    * `planes` hyperplane signs once; the query probes its own bucket plus
    * the XOR-subsets of its `probeDepth` LEAST-CONFIDENT planes (smallest
    * |projection| — exactly the planes a true neighbor is likeliest to land
    * on the other side of). 2^probeDepth of 2^planes buckets are read
    * (defaults: 16 of 4096 ≈ 0.4%), as a literal IN filter the scan can
    * push down — against a bucket-partitioned persisted corpus this
    * partition-prunes like the FTS postings path.
    *
    * Query planning runs two 1-row driver jobs (bucket+projections, then the
    * broadcast query vector) — the query vector is driver-resident in any
    * real ANN serving path; the corpus-side scan stays fully distributed. */
  def annTopK(emb: DataFrame, queryId: Long, k: Int, planes: Int = 12,
              probeDepth: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val bucketed = emb
      // explicit count: CPU-bound rows; AQE would coalesce the small shuffle
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt, col(idCol))
      .withColumn("v", asDouble(col(vecCol)))
      .withColumn("bucket", lshBucket(col("v"), planes))
      .persist()
    bucketed.count() // materialize before query-side + corpus-side scans
    try {
      val qRowOpt = bucketed.filter(col(idCol) === queryId)
        .select(col("bucket"), lshProjs(col("v"), planes))
        .limit(1).collect().headOption
      if (qRowOpt.isEmpty) return emptyTopK(emb, idCol) // unknown id →
        // empty top-k, same contract as bruteForceTopK
      val qRow = qRowOpt.get
      val qBucket = qRow.getLong(0)
      val uncertain = qRow.getSeq[Double](1).zipWithIndex
        .map { case (proj, p) => p -> math.abs(proj) }
        .sortBy(_._2).take(probeDepth).map(_._1)
      val probes = (0 until (1 << probeDepth)).map { mask =>
        uncertain.zipWithIndex.foldLeft(qBucket) { case (b, (p, i)) =>
          if ((mask & (1 << i)) != 0) b ^ (1L << p) else b
        }
      }.distinct
      // limit(1): a duplicated query id must not fan out every candidate row
      // through the crossJoin
      val q = bucketed.filter(col(idCol) === queryId)
        .select(col("v").as("qv")).limit(1)
      val topK = bucketed.filter(col(idCol) =!= queryId && col("bucket").isin(probes: _*))
        .crossJoin(broadcast(q))
        .withColumn("cosim", round(cosine(col("v"), col("qv")), 4))
        .select(col(idCol), col("cosim"))
        .orderBy(col("cosim").desc, col(idCol))
        .limit(k)
      materialize(topK)
    } finally bucketed.unpersist()
  }

  /** Persist the corpus partitioned BY LSH BUCKET (hyperplane sign pattern)
    * — the layout where [[annTopKPersisted]]'s probe set becomes a PARTITION
    * filter, so a query reads 2^probeDepth of 2^planes partitions instead
    * of scanning the corpus (the FTS bucketed-postings / IVF-cell trick
    * applied to hyperplane LSH). Bucket assignment is a pure map (native
    * kernel, no shuffle); returns the probe-ready reader. */
  def writeBucketed(emb: DataFrame, dir: String, planes: Int = 12,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    emb.withColumn("bucket", lshBucket(asDouble(col(vecCol)), planes))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    emb.sparkSession.read.parquet(dir)
  }

  /** [[annTopK]] over the PERSISTED bucketed layout: same query-directed
    * multiprobe (own bucket + XOR-flips of the probeDepth least-confident
    * planes), but the probe set is a literal partition filter on the
    * persisted corpus — 16 of 4096 buckets read at the defaults, no
    * in-memory re-bucketing of the corpus per query. The query vector is
    * driver-resident (any serving path's contract) and ships as a literal,
    * so the whole query is one pruned scan + TakeOrderedAndProject.
    *
    * SERVE-ONLY: the layout must already exist ([[writeBucketed]] builds it
    * once, the Index.write/read split) — a serving path that rewrote the
    * corpus per query would cost a full corpus write per call. `emb` is
    * consulted only to resolve the query id's vector. */
  def annTopKPersisted(emb: DataFrame, dir: String, queryId: Long, k: Int,
                       planes: Int = 12, probeDepth: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir)
    require(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p),
      s"no bucketed ANN layout at $dir — build it once with writeBucketed() " +
        "(build and serve are separate steps)")
    val celled = spark.read.parquet(dir)
    val qRow = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("v"))
      .select(col("v"), lshBucket(col("v"), planes).as("bucket"),
        lshProjs(col("v"), planes).as("projs"))
      .limit(1).collect().headOption
    if (qRow.isEmpty) return emptyTopK(emb, idCol)
    val qv = qRow.get.getSeq[Double](0).toArray
    val qBucket = qRow.get.getLong(1)
    val uncertain = qRow.get.getSeq[Double](2).zipWithIndex
      .map { case (proj, p) => p -> math.abs(proj) }
      .sortBy(_._2).take(probeDepth).map(_._1)
    val probes = (0 until (1 << probeDepth)).map { mask =>
      uncertain.zipWithIndex.foldLeft(qBucket) { case (b, (p, i)) =>
        if ((mask & (1 << i)) != 0) b ^ (1L << p) else b
      }
    }.distinct
    val qLit = array(qv.map(lit): _*)
    celled.filter(col("bucket").isin(probes: _*) && col(idCol) =!= queryId)
      .withColumn("cosim", round(cosine(asDouble(col(vecCol)), qLit), 4))
      .select(col(idCol), col("cosim"))
      .orderBy(col("cosim").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) top-k — the OTHER standard ANN scale path next to
    * LSH ([[annTopK]]): the corpus is coarse-quantized into `nlist` cells
    * (each vector assigned to its nearest centroid), and a query scans only
    * its `nprobe` nearest cells ≈ nprobe/nlist of the corpus.
    *
    * Centroids here are the `nlist` lowest-id corpus vectors — a real
    * deployment k-means-trains them; centroid QUALITY is orthogonal to the
    * partition/probe machinery this exercises. They ship to executors as
    * literal arrays inside the cell-assignment expression (a few KB —
    * constant-folded, no join, no shuffle for assignment), so at 100 TB the
    * assignment is a pure map over the corpus and the probe filter
    * partition-prunes against a cell-partitioned persisted layout exactly
    * like the FTS postings path. Cell = argmax cosine(v, centroidᵢ),
    * computed as argmax of dot(v, cᵢ)/‖cᵢ‖ (the ‖v‖ factor is constant
    * across cells).
    *
    * Same serving-path contract as [[annTopK]]: the ≤ k result rows are
    * materialized eagerly and scratch caches released. */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int, nlist: Int = 16,
              nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              trainIters: Int = DefaultTrainIters): DataFrame = {
    val spark = emb.sparkSession
    // nlist × dim doubles on the driver — the "trained quantizer" artifact
    val (centroids, cNorms) = centroidsOf(emb, nlist, idCol, vecCol, trainIters)
    val celled = emb
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt, col(idCol))
      .withColumn("v", asDouble(col(vecCol)))
      .withColumn("cell", cellExpr(col("v"), centroids, cNorms))
      .persist()
    celled.count()
    try {
      val qRow = celled.filter(col(idCol) === queryId)
        .select(col("v")).limit(1).collect().headOption
      if (qRow.isEmpty) return emptyTopK(emb, idCol)
      val qv = qRow.get.getSeq[Double](0).toArray
      val probes = nearestCells(qv, centroids, cNorms, nprobe)
      val q = celled.filter(col(idCol) === queryId)
        .select(col("v").as("qv")).limit(1)
      val topK = celled
        .filter(col(idCol) =!= queryId && col("cell").isin(probes: _*))
        .crossJoin(broadcast(q))
        .withColumn("cosim", round(cosine(col("v"), col("qv")), 4))
        .select(col(idCol), col("cosim"))
        .orderBy(col("cosim").desc, col(idCol))
        .limit(k)
      materialize(topK)
    } finally celled.unpersist()
  }

  /** Lloyd iterations the quantizer trainers default to: enough to move
    * the seeds onto the data's cluster structure (assignments are stable
    * well before 5 on clustered corpora); each iteration costs one corpus
    * pass. */
  val DefaultTrainIters = 3

  /** The "trained quantizer" artifact: nlist centroids (+ norms). Seeds
    * are the nlist lowest-id corpus vectors (deterministic), refined by
    * `trainIters` Lloyd iterations under the SERVING metric (cell = argmax
    * dot(v,c)/‖c‖ — training and probing must agree on the assignment or
    * the trained cells don't match the probed ones). */
  private def centroidsOf(emb: DataFrame, nlist: Int, idCol: String,
                          vecCol: String,
                          trainIters: Int = DefaultTrainIters)
      : (Seq[Array[Double]], Seq[Double]) = {
    val seeds: Seq[Array[Double]] = emb.orderBy(col(idCol)).limit(nlist)
      .select(asDouble(col(vecCol))).collect()
      .map(_.getSeq[Double](0).toArray).toSeq
    val cs =
      if (trainIters <= 0) seeds
      else trainCentroids(emb.select(asDouble(col(vecCol)).as("v")),
        seeds, trainIters)
    (cs, cs.map(c => math.sqrt(c.map(x => x * x).sum)))
  }

  /** Distributed Lloyd's over `vv` (a 1-column `v: array<double>` frame):
    * assign every vector to its cell under the serving metric, then move
    * each centroid to the elementwise MEAN of its members — both steps as
    * DataFrame operations. The update explodes (cell, dim, value) rows,
    * but hash aggregation's map-side combine collapses them to
    * cells×dim partials per task BEFORE the shuffle, so the shuffle and
    * the driver state are nlist×dim regardless of corpus size — the same
    * partial-agg shape the reference's Lloyd uses (reference
    * mllib/clustering/KMeans.scala runAlgorithmWithWeight's per-partition
    * sum accumulation). An emptied cell keeps its previous centroid
    * (standard Lloyd degeneracy handling). */
  private[pipeline] def trainCentroids(vv: DataFrame,
                                       init: Seq[Array[Double]],
                                       iters: Int): Seq[Array[Double]] = {
    var cents = init
    for (_ <- 1 to iters) {
      val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val means = vv
        .withColumn("cell", cellExpr(col("v"), cents, norms))
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, i) =>
        means.get(i + 1) match {
          case Some(rows) =>
            val arr = new Array[Double](old.length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            // a zero mean has no direction under the dot/‖c‖ metric —
            // keep the old centroid rather than divide by a zero norm
            if (arr.exists(_ != 0.0)) arr else old
          case None => old
        }
      }
    }
    cents
  }

  /** Cell-assignment column: argmax over per-cell scaled dot products
    * (1-based, deterministic first-max). Native kernel
    * ([[graft.ext.CellAssignExpr]]): the former declarative
    * `array_position(scores, array_max(scores))` unrolled nlist dot
    * products into one generated method, which exceeds the JVM's 64 KB
    * limit at deployment sizing (nlist ∝ corpus — ScaleSpot100 hit it at
    * nlist = 1600) and dropped the stage to interpreted execution; the
    * kernel reproduces its scores and first-max tiebreak bit-for-bit. */
  private[graft] def cellExpr(v: Column, centroids: Seq[Array[Double]],
                              cNorms: Seq[Double]): Column =
    kcol(graft.ext.CellAssignExpr(kexp(v),
      centroids.map(_.clone()).toArray, cNorms.toArray))

  /** Persist the IVF-celled corpus partitioned BY CELL — the layout where a
    * query's probe set becomes a partition filter, so the scan reads
    * nprobe/nlist of the files instead of the corpus (the vector analogue
    * of the FTS bucketed postings layout). Returns the probe-ready reader. */
  def writeCelled(emb: DataFrame, dir: String, nlist: Int = 16,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  trainIters: Int = DefaultTrainIters): DataFrame =
    writeCelledWith(emb, dir, nlist, idCol, vecCol, trainIters)._1

  /** [[writeCelled]] plus the quantizer artifact it trained — so a caller
    * that needs the centroids (the persisted probe path) doesn't pay the
    * full-corpus centroid collection a second time. */
  private def writeCelledWith(emb: DataFrame, dir: String, nlist: Int,
                              idCol: String, vecCol: String,
                              trainIters: Int = DefaultTrainIters)
      : (DataFrame, Seq[Array[Double]], Seq[Double]) = {
    val (centroids, cNorms) = centroidsOf(emb, nlist, idCol, vecCol, trainIters)
    emb.withColumn("cell", cellExpr(asDouble(col(vecCol)), centroids, cNorms))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    // the quantizer artifact travels WITH the layout (underscore dir: data
    // discovery skips it): serving reads nlist rows instead of re-training
    // from the corpus per query
    writeCentroids(emb.sparkSession, dir, centroids)
    (emb.sparkSession.read.parquet(dir), centroids, cNorms)
  }

  private[graft] def writeCentroids(spark: org.apache.spark.sql.SparkSession,
                                    dir: String,
                                    centroids: Seq[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i + 1, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_quantizer")
  }

  private[graft] def writePqBooks(spark: org.apache.spark.sql.SparkSession,
                                  dir: String,
                                  codebooks: Seq[Seq[Array[Double]]]): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex
      .flatMap { case (cents, s) =>
        cents.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) } }
      .toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_pq")
  }

  /** Train and persist ONLY the quantizer artifacts (coarse centroids at
    * `_quantizer`, PQ codebooks at `_pq`) — the init step of the streaming
    * vector index ([[graft.streaming.StreamVectorIndex]]): one training
    * pass up front, every later batch ENCODES against the frozen artifacts
    * (the serve-never-retrains contract applied to ingest). */
  def writeQuantizer(emb: DataFrame, dir: String, nlist: Int = 16,
                     m: Int = 8, ncent: Int = 16,
                     trainIters: Int = DefaultTrainIters,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Unit = {
    val (centroids, _) = centroidsOf(emb, nlist, idCol, vecCol, trainIters)
    writeCentroids(emb.sparkSession, dir, centroids)
    writePqBooks(emb.sparkSession, dir,
      trainPqCodebooks(emb, m, ncent, trainIters, idCol, vecCol))
  }

  /** The persisted quantizer ([[writeCelledWith]]): nlist rows. */
  private[graft] def readQuantizer(spark: org.apache.spark.sql.SparkSession,
                                   dir: String): (Seq[Array[Double]], Seq[Double]) = {
    val cs: Seq[Array[Double]] = spark.read.parquet(s"$dir/_quantizer")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray).toSeq
    (cs, cs.map(c => math.sqrt(c.map(x => x * x).sum)))
  }

  /** IVF top-k over the PERSISTED celled layout: probes are a literal cell
    * filter the reader turns into a PARTITION filter — nprobe/nlist of the
    * files read, corpus never scanned. The query vector is driver-resident
    * (as in any serving path) and ships as a literal, so the probe is a
    * single pruned scan + TakeOrderedAndProject.
    *
    * SERVE-ONLY like [[annTopKPersisted]]: [[writeCelled]] builds the
    * layout AND its quantizer once; serving reads the nlist persisted
    * centroids for probe selection — never re-training from the corpus. */
  def ivfTopKPersisted(emb: DataFrame, dir: String, queryId: Long, k: Int,
                       nlist: Int = 16, nprobe: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir)
    require(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p),
      s"no celled IVF layout at $dir — build it once with writeCelled() " +
        "(build and serve are separate steps)")
    val celled = spark.read.parquet(dir)
    val (centroids, cNorms) = readQuantizer(spark, dir)
    val qRow = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).limit(1).collect().headOption
    if (qRow.isEmpty) return emptyTopK(emb, idCol)
    val qv = qRow.get.getSeq[Double](0).toArray
    val probes = nearestCells(qv, centroids, cNorms, nprobe)
    val qLit = array(qv.map(lit): _*)
    celled.filter(col("cell").isin(probes: _*) && col(idCol) =!= queryId)
      .withColumn("cosim", round(cosine(asDouble(col(vecCol)), qLit), 4))
      .select(col(idCol), col("cosim"))
      .orderBy(col("cosim").desc, col(idCol))
      .limit(k)
  }

  /** PRODUCT-QUANTIZATION codebooks: deterministic — the sub-vectors of
    * the `ncent` lowest-id corpus vectors (the same convention as the IVF
    * centroids: codebook QUALITY is orthogonal to the encode/serve
    * machinery this exercises; a real deployment k-means-trains each
    * sub-space). `codebooks(s)(c)` = centroid c's slice of sub-space s. */
  def pqCodebooks(emb: DataFrame, m: Int = 8, ncent: Int = 16,
                  idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Seq[Array[Double]]] = {
    val cents: Seq[Array[Double]] = emb.orderBy(col(idCol)).limit(ncent)
      .select(asDouble(col(vecCol))).collect()
      .map(_.getSeq[Double](0).toArray).toSeq
    val sub = cents.head.length / m
    (0 until m).map(s => cents.map(c => c.slice(s * sub, (s + 1) * sub)))
  }

  /** K-means-trained PQ codebooks: [[pqCodebooks]]' deterministic seeds
    * refined by per-sub-space Lloyd under the ENCODE metric (argmin
    * rounded-L2 — training replays [[pqEncode]] itself for assignment, so
    * trained codes and served codes agree by construction). Same
    * map-side-combine shape as [[trainCentroids]]: the exploded
    * (sub, code, dim) rows collapse to m×ncent×subdim partials per task,
    * driver state = the codebooks. All m sub-spaces train in ONE corpus
    * pass per iteration (the encode kernel emits all m codes per row).
    * Emptied codes keep their previous centroid. NOT used by the
    * exact-checksum contract (`q_embed_pq` replays the seeds in SQL);
    * recall-contract paths ([[writeCelledPq]], [[pqTopK]]) default to it. */
  def trainPqCodebooks(emb: DataFrame, m: Int = 8, ncent: Int = 16,
                       iters: Int = DefaultTrainIters,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Seq[Seq[Array[Double]]] = {
    var books = pqCodebooks(emb, m, ncent, idCol, vecCol)
    if (iters <= 0) return books
    val sub = books.head.head.length
    val vv = emb.select(asDouble(col(vecCol)).as("v")).persist()
    vv.count()
    try {
      for (_ <- 1 to iters) {
        val means = vv
          .select(col("v"), posexplode(pqEncode(col("v"), books)).as(Seq("s", "code")))
          .select(col("s"), col("code"),
            posexplode(slice(col("v"), col("s") * sub + 1, lit(sub)))
              .as(Seq("pos", "x")))
          .groupBy("s", "code", "pos").agg(avg(col("x")).as("m"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
        books = books.zipWithIndex.map { case (cents, s) =>
          cents.zipWithIndex.map { case (old, c) =>
            means.get((s, c)) match {
              case Some(rows) =>
                val arr = new Array[Double](sub)
                rows.foreach(r => arr(r.getInt(2)) = r.getDouble(3))
                arr
              case None => old
            }
          }
        }
      }
      books
    } finally vv.unpersist()
  }

  /** PQ ENCODE: per sub-space, the 0-based index of the L2-nearest
    * codebook centroid — an `array<int>` of m codes per vector (D float32
    * dims compress to m small ints; at the defaults 64×4 B → 8 codes, the
    * 32× storage step between int8 and raw). Native kernel
    * ([[graft.ext.PqEncodeExpr]]) — one compiled call per row; the
    * declarative unroll it replaces was a ~1000-term expression whose
    * codegen compilation cost ~10 s per plan. Distances are left-fold
    * index-order sums ROUNDED to 9 decimals before the argmin
    * (near-equidistant centroids must not flip assignment on last-ulp
    * summation differences across engines); ties break to the lowest
    * centroid index. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Array[Double]]]): Column =
    kcol(graft.ext.PqEncodeExpr(kexp(vec),
      codebooks.map(_.toArray).toArray))

  /** The PQ BUILD step: every vector encoded to its m codes —
    * `(idCol, pq_codes array<int>)`. At 100 TB this frame is written once
    * (32× smaller than the raw vectors at the defaults) and serving scans
    * IT, never the raw corpus; pure map, no shuffle. */
  def pqEncodeAll(emb: DataFrame, codebooks: Seq[Seq[Array[Double]]],
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol),
      pqEncode(asDouble(col(vecCol)), codebooks).as("pq_codes"))

  /** ADC (asymmetric-distance) top-k over a PRE-ENCODED codes frame: the
    * query stays full-precision; each candidate costs m table lookups —
    * score = Σ_s LUT[s][code_s] with LUT[s][c] = ‖q_sub(s) − codebook(s)(c)‖²,
    * the m×ncent LUT built driver-side per query and shipped as literals.
    * The scan reads CODES only (m small ints per doc), not raw vectors —
    * the PQ serving property; rank quality is a recall contract against
    * exact L2 (asserted by q_sim_pq on the clustered fixture), not an
    * identity. */
  def pqTopKOnCodes(codes: DataFrame, qv: Array[Double],
                    codebooks: Seq[Seq[Array[Double]]], queryId: Long,
                    k: Int, idCol: String = "vec_id"): DataFrame = {
    val m = codebooks.size
    val sub = qv.length / m
    val lut: Seq[Seq[Double]] = (0 until m).map { s =>
      codebooks(s).map { cent =>
        (0 until sub).map { i =>
          val d = qv(s * sub + i) - cent(i); d * d
        }.sum
      }
    }
    val adc = (0 until m).map { s =>
      element_at(array(lut(s).map(lit): _*),
        element_at(col("pq_codes"), s + 1) + 1)
    }.reduce(_ + _)
    codes.filter(col(idCol) =!= queryId)
      .withColumn("adc", round(adc, 6))
      .select(col(idCol), col("adc"))
      .orderBy(col("adc").asc, col(idCol))
      .limit(k)
  }

  /** Build-and-serve convenience (the bm25TopK-style demo path: a real
    * deployment runs [[pqEncodeAll]] once and serves [[pqTopKOnCodes]]
    * over the stored codes). */
  def pqTopK(emb: DataFrame, queryId: Long, k: Int, m: Int = 8,
             ncent: Int = 16, idCol: String = "vec_id",
             vecCol: String = "embedding",
             trainIters: Int = DefaultTrainIters): DataFrame = {
    val codebooks = trainPqCodebooks(emb, m, ncent, trainIters, idCol, vecCol)
    val qRow = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).limit(1).collect().headOption
    if (qRow.isEmpty) return emptyTopK(emb, idCol)
    pqTopKOnCodes(pqEncodeAll(emb, codebooks, idCol, vecCol),
      qRow.get.getSeq[Double](0).toArray, codebooks, queryId, k, idCol)
  }

  /** HARD-NEGATIVE MINING for contrastive/embedding training: for every
    * query row, the `k` nearest corpus vectors carrying a DIFFERENT
    * label — the "similar but wrong" examples a triplet/InfoNCE trainer
    * wants, mined exactly (the query side is the bounded anchor sample a
    * trainer mines per step, broadcast; the corpus side is one scan).
    * Per-query top-k is the rank-filtered window Spark 4 bounds map-side
    * via WindowGroupLimit — the same shape as [[knnJoin]], which is also
    * the scale path when the anchor set grows: cell-prune with knnJoin,
    * then apply the label-mismatch residual before the window.
    * Returns (q_id, n_id, cosim), ties to the lower neighbor id. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qv"), col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("n_id"),
      asDouble(col(vecCol)).as("nv"), col(labelCol).as("n_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosim").desc, col("n_id"))
    c.crossJoin(broadcast(q))
      .filter(col("n_label") =!= col("q_label"))
      .withColumn("cosim", round(cosine(col("nv"), col("qv")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("cosim"))
  }

  /** Element-wise residual of `v` against its 1-based `cell`'s centroid —
    * the quantity RESIDUAL IVF-PQ encodes instead of the raw vector. */
  private def residualExpr(v: Column, cell: Column,
                           centroids: Seq[Array[Double]]): Column = {
    val centArr = element_at(
      array(centroids.map(c => array(c.map(lit): _*)): _*), cell)
    zip_with(v, centArr, (x, c) => x - c)
  }

  /** IVF-PQ BUILD: the cell-partitioned layout + quantizer from
    * [[writeCelled]], PLUS a cell-partitioned CODES projection
    * (`$dir/_codes`: idCol, pq_codes — underscore dir, so the celled read
    * skips it) and the PQ codebooks (`$dir/_pq`). The FAISS-standard
    * composition: serving partition-prunes to the probe cells and scans m
    * small ints per candidate — at 100 TB, nprobe/nlist of a corpus 32×
    * smaller than the raw vectors.
    *
    * `residual = true` builds the STANDARD FAISS IVF-PQ encoding: codes
    * quantize `v − centroid(cell)` rather than `v`, and the codebooks
    * train on those residuals. On clustered data this is the difference
    * between wasting the codebook's resolution re-describing WHICH
    * cluster (already known from the cell) and spending all of it on the
    * within-cluster offsets that actually rank candidates — measured in
    * AnnRecallSpot: raw-ADC recall@10 collapses with cluster density
    * while residual-ADC holds (serving reads the per-layout `_pqmeta`
    * marker and builds per-probed-cell LUTs; same scan, same row width). */
  def writeCelledPq(emb: DataFrame, dir: String, nlist: Int = 16,
                    m: Int = 8, ncent: Int = 16, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    trainIters: Int = DefaultTrainIters,
                    residual: Boolean = false): Unit = {
    val spark = emb.sparkSession
    val (celled, centroids, _) =
      writeCelledWith(emb, dir, nlist, idCol, vecCol, trainIters)
    val encodeInput =
      if (residual)
        celled.select(col(idCol), col("cell"),
          residualExpr(asDouble(col(vecCol)), col("cell"), centroids)
            .as(vecCol))
      else celled.select(col(idCol), col("cell"), asDouble(col(vecCol)).as(vecCol))
    val codebooks =
      trainPqCodebooks(encodeInput, m, ncent, trainIters, idCol, vecCol)
    encodeInput.select(col(idCol), col("cell"),
        pqEncode(col(vecCol), codebooks).as("pq_codes"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/_codes")
    // per-cell population histogram (nlist rows) — serving derives the
    // density-adaptive refine shortlist from it without scanning codes
    encodeInput.groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_cellhist")
    writePqBooks(spark, dir, codebooks)
    import spark.implicits._
    Seq(residual).toDF("residual").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_pqmeta")
  }

  private[graft] def readPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                                     dir: String): Seq[Seq[Array[Double]]] = {
    val rows = spark.read.parquet(s"$dir/_pq")
      .orderBy("sub", "code").collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map(_._2.toSeq
      .sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray))
  }

  /** RESIDUAL-ADC top-k over probed code rows: the LUT is PER CELL — the
    * query's residual against each probed cell's centroid replaces the
    * raw query in the table build — and the scan picks its cell's LUT
    * through one chained CASE on the partition column (nprobe branches of
    * m lookups; same code-row scan as [[pqTopKOnCodes]], no extra IO). */
  private def pqTopKOnCodesResidual(codes: DataFrame, qv: Array[Double],
                                    codebooks: Seq[Seq[Array[Double]]],
                                    centroids: Seq[Array[Double]],
                                    cells: Seq[Int], queryId: Long,
                                    k: Int, idCol: String): DataFrame = {
    val m = codebooks.size
    val sub = qv.length / m
    def adcFor(cell: Int): Column = {
      val cent = centroids(cell - 1) // cells are 1-based
      val qr = qv.indices.map(i => qv(i) - cent(i))
      val lut: Seq[Seq[Double]] = (0 until m).map { s =>
        codebooks(s).map { cb =>
          (0 until sub).map { i =>
            val d = qr(s * sub + i) - cb(i); d * d
          }.sum
        }
      }
      (0 until m).map { s =>
        element_at(array(lut(s).map(lit): _*),
          element_at(col("pq_codes"), s + 1) + 1)
      }.reduce(_ + _)
    }
    // one chained CaseWhen (branch per probed cell), not a nested fold —
    // each .when() appends a branch to the same expression
    val adc = cells.tail.foldLeft(
      when(col("cell") === cells.head, adcFor(cells.head))) {
      (acc, c) => acc.when(col("cell") === c, adcFor(c))
    }
    codes.filter(col(idCol) =!= queryId)
      .withColumn("adc", round(adc, 6))
      .select(col(idCol), col("adc"))
      .orderBy(col("adc").asc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ SERVE: probe the quantizer's `nprobe` nearest cells — a
    * PARTITION filter on the codes layout — and rank the survivors by ADC
    * over their code rows. Serve-only like the other persisted paths;
    * `emb` is consulted only for the query id's vector. Residual layouts
    * (`writeCelledPq(residual = true)`, detected from the `_pqmeta`
    * marker) serve through the per-cell residual LUTs. */
  def ivfPqTopK(emb: DataFrame, dir: String, queryId: Long, k: Int,
                nprobe: Int = 4, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$dir/_codes")
    require(p.getFileSystem(hconf).exists(p),
      s"no IVF-PQ layout at $dir — build it once with writeCelledPq() " +
        "(build and serve are separate steps)")
    val (centroids, cNorms) = readQuantizer(spark, dir)
    val codebooks = readPqCodebooks(spark, dir)
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/_pqmeta")
    val residual = metaPath.getFileSystem(hconf).exists(metaPath) &&
      spark.read.parquet(s"$dir/_pqmeta").head().getBoolean(0)
    val qRow = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).limit(1).collect().headOption
    if (qRow.isEmpty) return emptyTopK(emb, idCol)
    val qv = qRow.get.getSeq[Double](0).toArray
    val probes = nearestCells(qv, centroids, cNorms, nprobe)
    val codes =
      spark.read.parquet(s"$dir/_codes").filter(col("cell").isin(probes: _*))
    if (residual)
      pqTopKOnCodesResidual(codes, qv, codebooks, centroids,
        probes, queryId, k, idCol)
    else pqTopKOnCodes(codes, qv, codebooks, queryId, k, idCol)
  }

  /** IVF-PQ serve with a REFINE step (FAISS IndexRefineFlat / the
    * standard two-stage ANN serving): ADC over the probed cells produces
    * a SHORTLIST of `refine` candidates (cheap — code rows only), the
    * shortlist alone joins back to the stored vectors for EXACT cosine
    * re-ranking, and the top-k is exact-over-shortlist. This is the fix
    * for ADC's quantization error dominating tightly-clustered corpora
    * (measured in AnnRecallSpot: ADC-only recall@10 collapses as cluster
    * density grows; refined recall recovers to ~1.0) at a cost of one
    * `refine`-row broadcast-join against the corpus — candidate-bounded,
    * corpus-size-free. `refine = 0` (the default) sizes the shortlist
    * from the probed cells' populations ([[adaptiveRefine]]) so dense
    * clusters don't outgrow a fixed constant. Ranking convention matches
    * every serving path: cosim rounded to 4 dp, ties to the lower id. */
  def ivfPqTopKRefined(emb: DataFrame, dir: String, queryId: Long, k: Int,
                       nprobe: Int = 4, refine: Int = 0,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(refine == 0 || refine >= k,
      "refine shortlist must be at least k (0 = density-adaptive)")
    val eff =
      if (refine > 0) refine
      else adaptiveRefine(emb, dir, queryId, k, nprobe, idCol, vecCol)
    val shortlist = ivfPqTopK(emb, dir, queryId, eff, nprobe, idCol, vecCol)
      .select(col(idCol))
    val qRow = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv")).limit(1)
    emb.join(broadcast(shortlist), idCol)
      .crossJoin(broadcast(qRow))
      .withColumn("cosim", round(cosine(asDouble(col(vecCol)), col("qv")), 4))
      .select(col(idCol), col("cosim"))
      .orderBy(col("cosim").desc, col(idCol))
      .limit(k)
  }

  /** DENSITY-ADAPTIVE refine shortlist (round-11 verdict item 1; the
    * FAISS IndexRefineFlat k_factor made population-aware): a FIXED
    * shortlist silently degrades as cluster density grows — a probed
    * cell with 830 members vs a 100-candidate shortlist measured 0.163
    * recall@10 at ×10 density — so the default derives from the probed
    * cells' member counts: `max(10·k, ⌈candidates/2⌉)` where candidates
    * = Σ members(probed). The counts come from the build-time `_cellhist`
    * histogram (nlist rows — no corpus scan at serve time); layouts built
    * before the histogram existed fall back to one partition-pruned count
    * over the code rows the ADC stage scans anyway. The ⌈/2⌉ keeps the
    * exact-rerank join candidate-bounded (≤ half the probed population)
    * while covering any cluster whose size is within 2× the probe set —
    * the regime where the fixed default was measured losing neighbors. */
  private[graft] def adaptiveRefine(emb: DataFrame, dir: String, queryId: Long,
                                    k: Int, nprobe: Int, idCol: String,
                                    vecCol: String): Int = {
    val spark = emb.sparkSession
    val floor = math.max(100, 10 * k)
    val qRow = emb.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).limit(1).collect().headOption
    if (qRow.isEmpty) return floor // serve path returns empty anyway
    val (centroids, cNorms) = readQuantizer(spark, dir)
    val probes =
      nearestCells(qRow.get.getSeq[Double](0).toArray, centroids, cNorms, nprobe)
    val hconf = spark.sparkContext.hadoopConfiguration
    val histPath = new org.apache.hadoop.fs.Path(s"$dir/_cellhist")
    val candidates =
      if (histPath.getFileSystem(hconf).exists(histPath))
        spark.read.parquet(s"$dir/_cellhist")
          .filter(col("cell").isin(probes: _*))
          .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
      else
        spark.read.parquet(s"$dir/_codes")
          .filter(col("cell").isin(probes: _*)).count()
    math.max(floor.toLong, (candidates + 1) / 2)
      .min(Int.MaxValue.toLong).toInt
  }

  /** Per-ROW probe set: the `nprobe` nearest cells (1-based) as an array
    * column — [[nearestCells]] as an expression, for operators where every
    * row is a query (no driver round-trip per query). Scores sort
    * descending with ties to the lower cell id, matching the driver-side
    * helper exactly (stable sort there, lexicographic struct sort here). */
  private[graft] def probeCellsExpr(v: Column, centroids: Seq[Array[Double]],
                                    cNorms: Seq[Double], nprobe: Int): Column = {
    val scored = array(centroids.zip(cNorms).zipWithIndex.map { case ((c, n), i) =>
      struct((-dot(v, array(c.map(lit): _*)) / lit(n)).as("negs"),
        lit(i + 1).cast("int").as("cell"))
    }: _*)
    transform(slice(sort_array(scored), 1, nprobe), s => s.getField("cell"))
  }

  /** Batch k-NN JOIN — the top-k nearest corpus vectors for EVERY query
    * row, the all-queries shape behind semantic dedup, clustering
    * assignment, and retrieval evaluation (single-query serving is
    * [[ivfTopK]]; this is its join form). IVF-pruned: the corpus is
    * cell-assigned once, each query row derives its `nprobe` probe cells
    * AS A COLUMN ([[probeCellsExpr]] — no driver round-trips), and
    * candidates meet in a plain equi-join on the cell id, so the compared
    * pairs are |Q|·|corpus|·(nprobe/nlist) instead of the |Q|·|corpus|
    * cross product. Per-query top-k is a rank-filtered window that Spark 4
    * bounds map-side via WindowGroupLimit (partial top-k before the
    * final-rank shuffle — plan-asserted in PlanShapeSpec).
    *
    * Scale shape: one shuffle of the corpus on cell, one shuffle of
    * |Q|·nprobe probe rows on cell, one shuffle of the candidate pairs on
    * q_id (bounded map-side to k per query); a skewed hot cell (dense
    * cluster) is AQE skew-join territory, the same posture as any skewed
    * equi-join. With `nprobe = nlist` the join degenerates to exact
    * brute force through identical machinery (the oracle-exact mode).
    *
    * Returns `(q_id, n_id, cosim)`, k rows per query, cosim rounded to
    * 4 dp with ties to the lower neighbor id (every serving path's
    * reproducibility convention). Self-pairs (same id) are excluded when
    * `excludeSelf` — the semantic-dedup self-join default. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              excludeSelf: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding",
              trainIters: Int = DefaultTrainIters): DataFrame = {
    val (centroids, cNorms) = centroidsOf(corpus, nlist, idCol, vecCol, trainIters)
    val celled = corpus
      .select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cell", cellExpr(col("v"), centroids, cNorms))
    val probes = queries
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(probeCellsExpr(col("qv"), centroids, cNorms, nprobe)))
    val pairs = probes.join(celled, "cell")
      .where(if (excludeSelf) col("q_id") =!= col("n_id") else lit(true))
      .withColumn("cosim", round(cosine(col("qv"), col("v")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosim").desc, col("n_id"))
    pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("cosim"))
  }

  /** GRAPH-BASED ANN — a deterministic single-layer NSW (the
    * navigable-small-world family HNSW stacks into layers; Malkov &
    * Yashunin 2018, simplified to one layer with a FIXED entry point so
    * every step replays across engines): the index is the k-NN GRAPH
    * (each vector's `degree` best neighbors — [[knnJoin]] in exact mode),
    * serving is a `hops`-step beam search — expand the beam's
    * out-neighbors, rescore against the query, keep the best `beam` by
    * (rounded cosine, id) — then top-k from the final beam.
    *
    * Scale shape: the graph build is the blocked [[knnJoin]] (an index-
    * time cost, persisted in a real deployment); serving touches
    * ≤ hops · beam · degree candidate rows regardless of corpus size —
    * the sublinear-serving property that makes graph ANN the
    * low-latency alternative to IVF probing. The graph is persisted for
    * the duration of the search so the build runs once, not per hop;
    * each hop's beam is localCheckpointed (beam-sized) to truncate the
    * iterative lineage. Greedy beam search can miss across graph
    * disconnections — recall is measured, not promised (like every ANN
    * path here). */
  /** The NSW out-neighbor graph: each vector's `degree` best neighbors.
    * `nprobe = 0` (default) builds EXACTLY (all cells probed — what the
    * oracle replays); a positive nprobe builds the approximate graph a
    * large corpus would (the same accuracy economics as real HNSW
    * construction, measured in AnnRecallSpot). */
  def nswGraph(emb: DataFrame, degree: Int = 8, nlist: Int = 16,
               nprobe: Int = 0, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    knnJoin(emb, emb, degree, nlist,
        nprobe = if (nprobe > 0) nprobe else nlist,
        idCol = idCol, vecCol = vecCol)
      .select(col("q_id").as("src"), col("n_id").as("dst"))

  /** Beam search over a PRE-BUILT (caller-persisted) [[nswGraph]] — the
    * serving half of [[nswTopK]], for deployments where the graph is an
    * index-time artifact probed by many queries. */
  def nswSearch(emb: DataFrame, graph: DataFrame, queryId: Long, k: Int,
                beam: Int = 16, hops: Int = 3, entries: Int = 16,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && hops >= 1, "k and hops must be positive")
    require(beam >= k, s"beam $beam must cover k=$k")
    require(entries >= 1, "need at least one entry point")
    locally {
      val q = emb.filter(col(idCol) === queryId)
        .select(asDouble(col(vecCol)).as("qv")).limit(1)
      val vecs = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      def scored(ids: DataFrame): DataFrame = ids.join(vecs, "id")
        .crossJoin(broadcast(q))
        .select(col("id"), round(cosine(col("v"), col("qv")), 4).as("s"))
      // MULTI-ENTRY seeding (the DiskANN medoid-set / HNSW upper-layer
      // role): a k-NN graph over clustered data grows NO cross-cluster
      // edges (intra-cluster neighbors always win), so a single entry
      // can never leave its island — measured 0.06 recall@10 on the
      // 16-cluster corpus vs 1.00 with 16 spread entries. Lowest
      // `entries` ids = deterministic and oracle-replayable.
      var cand = scored(vecs.select("id").orderBy(col("id")).limit(entries))
        .orderBy(col("s").desc, col("id")).limit(beam)
        .localCheckpoint()
      for (_ <- 1 to hops) {
        val nbrs = cand.select(col("id"))
          .join(graph, col("id") === col("src"))
          .select(col("dst").as("id"))
        val pool = cand.select("id").union(nbrs).distinct()
        cand = scored(pool)
          .orderBy(col("s").desc, col("id")).limit(beam)
          .localCheckpoint()
      }
      cand.filter(col("id") =!= queryId)
        .orderBy(col("s").desc, col("id")).limit(k)
        .select(col("id").as(idCol), col("s").as("cosim"))
    }
  }

  /** One-call NSW: build the exact graph, search, release. */
  def nswTopK(emb: DataFrame, queryId: Long, k: Int, degree: Int = 8,
              beam: Int = 16, hops: Int = 3, nlist: Int = 16,
              entries: Int = 16, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(degree >= 1, "degree must be positive")
    val graph = nswGraph(emb, degree, nlist, nprobe = 0, idCol, vecCol).persist()
    try {
      graph.count() // materialize once; hops re-read it
      nswSearch(emb, graph, queryId, k, beam, hops, entries, idCol, vecCol)
    } finally graph.unpersist()
  }

  /** Symmetric int8 quantization scale for a vector: 127/max|xᵢ| — the
    * storage-compression step a 100 TB embedding corpus ships with (4×
    * smaller than float32; dot products stay rank-preserving to ~1e-2).
    * NULL for an all-zero/empty vector (nothing to scale). */
  def quantScale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x)))
    when(maxAbs > 0.0, lit(127.0) / maxAbs)
  }

  /** The int8-quantized vector: round(xᵢ·scale) per element (half away from
    * zero on both Spark and the oracle engine, so codes are reproducible). */
  def quantizeInt8(vec: Column): Column = {
    val sc = quantScale(vec)
    transform(vec, x => round(x * sc).cast("int"))
  }

  /** A MULTI-VECTOR view of a single-vector corpus: each embedding split
    * into `m` contiguous sub-vectors → rows `(id, pos, vec)` with vec cast
    * to double. The deterministic bridge fixture for late-interaction
    * scoring until a corpus carries real per-token vectors (a ColBERT-style
    * table would land in exactly this shape: one row per document token). */
  def sliceVectors(emb: DataFrame, m: Int, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(m >= 1, "m must be positive")
    val L = (size(col(vecCol)) / m).cast("int")
    val toks = array((0 until m).map(g =>
      struct(lit(g).as("pos"),
        slice(asDouble(col(vecCol)), L * g + 1, L).as("vec"))): _*)
    emb.select(col(idCol), explode(toks).as("tok"))
      .select(col(idCol), col("tok.pos").as("pos"), col("tok.vec").as("vec"))
  }

  /** ColBERT-style LATE-INTERACTION scoring: score(Q, D) =
    * Σ_qtoken max_dtoken cosine(q, d) — each query token finds its best
    * match in the document, the per-token maxima sum (MaxSim). Input is
    * the multi-vector shape `(id, pos, vec)` ([[sliceVectors]], or a real
    * per-token table). The query side (a handful of rows) inlines as
    * literal columns, so the interaction is ONE projection pass over the
    * corpus tokens and the per-token maxima + sum fold into a SINGLE
    * partial-aggregating groupBy on the id — one shuffle total, no join,
    * and top-k plans as TakeOrderedAndProject (per-partition heaps, no
    * global sort). Ranking
    * on the ROUNDED score (then id) for cross-engine reproducibility.
    * This is the brute-force BASELINE; at corpus scale serve through
    * [[maxSimRerank]] (candidate retrieval on a pooled vector, MaxSim only
    * over candidates). */
  def maxSimTopK(docToks: DataFrame, qToks: DataFrame, k: Int,
                 idCol: String = "vec_id"): DataFrame = {
    // the query side is a handful of token vectors BY DEFINITION — they
    // inline as literal columns (same bounded-collect pattern as the
    // trained centroids), so the interaction is a pure projection: one
    // cosine column per query token, no join, and the per-token maxima +
    // sum fold into a SINGLE partial-aggregating groupBy on the id (the
    // join formulation costs an m× row blowup plus a second shuffle)
    val q = qToks.select(col("pos"), col("vec")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    require(q.nonEmpty, "empty query token set")
    require(q.length <= 1024, s"${q.length} query tokens — not a query")
    val maxima = q.zipWithIndex.map { case ((_, qv), i) =>
      max(cosine(col("vec"), typedLit(qv.toSeq))).as(s"_m$i")
    }
    docToks.groupBy(col(idCol)).agg(maxima.head, maxima.tail: _*)
      .select(col(idCol),
        round(q.indices.map(i => col(s"_m$i")).reduce(_ + _), 4).as("maxsim"))
      .orderBy(col("maxsim").desc, col(idCol))
      .limit(k)
  }

  /** RETRIEVE-THEN-RERANK late interaction — the shape that scales: stage
    * 1 retrieves `nCandidates` ids by POOLED-vector cosine (the existing
    * top-k machinery: broadcast query, per-partition heaps; swap in
    * [[ivfTopK]]/[[annTopKPersisted]] for a pruned first stage), stage 2
    * re-ranks ONLY those candidates with full MaxSim over the `m`-way
    * multi-vector view. Rerank cost is bounded by nCandidates·m·m
    * regardless of corpus size. With the exact first stage used here the
    * result is deterministic end-to-end (both stages rank on rounded
    * scores, id tie-break). */
  def maxSimRerank(emb: DataFrame, queryId: Long, k: Int, m: Int = 4,
                   nCandidates: Int = 40, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val cands = bruteForceTopK(emb, queryId, nCandidates, idCol, vecCol)
      .select(col(idCol))
    val candToks = sliceVectors(
      emb.join(broadcast(cands), Seq(idCol), "left_semi"), m, idCol, vecCol)
    val qToks = sliceVectors(
        emb.filter(col(idCol) === queryId).limit(1), m, idCol, vecCol)
      .select(col("pos"), col("vec"))
    maxSimTopK(candToks, qToks, k, idCol)
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold,
    * candidate-limited to LSH bucket collisions (never all-pairs). */
  def nearDupPairs(emb: DataFrame, threshold: Double, planes: Int = 8,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb
      .repartition(emb.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, col(idCol))
      .withColumn("v", asDouble(col(vecCol)))
      .withColumn("bucket", lshBucket(col("v"), planes))
      .select(col(idCol).as("id"), col("v"), col("bucket"))
      .persist()
    bucketed.count() // materialize before the self-join
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosim", round(cosine(col("a.v"), col("b.v")), 4))
      .filter(col("cosim") >= threshold)
      .select(col("a.id").as("aid"), col("b.id").as("bid"), col("cosim"))
      .orderBy("aid", "bid")
  }
}
