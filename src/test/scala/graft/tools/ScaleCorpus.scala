package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared N×-sf0.1 corpus materialization for the scale spot-runs
  * ([[ScaleSpot]], [[StreamScaleSpot]]). Growth model: replicas with
  * DISJOINT id ranges (the natural "more documents / more users" growth,
  * not wider rows).
  *
  *  - `documents`: replica k's TEXT is token-shuffled by a per-replica
  *    hash order — token multiset (tf/df/dl/BM25 stats) preserved, shingle
  *    sequences differ, so replicas do NOT near-duplicate each other and
  *    true near-dup pairs grow LINEARLY (a verbatim replica would grow
  *    pairs k² and measure the data, not the engine).
  *  - `events`: event_id AND user_id both offset per replica — the
  *    stream-stream interval join meets only within a replica, so join
  *    output grows linearly (verbatim user_ids would cross-join replicas).
  *  - `embeddings`/`lineitem`: plain id-offset replicas.
  */
object ScaleCorpus {
  val base = "/root/testdata/sf0.1"

  def replicas(spark: SparkSession, out: String, factor: Int,
               name: String, idCols: Seq[String])(
      perReplica: (DataFrame, Int) => DataFrame): Unit = {
    val src = spark.read.parquet(s"$base/$name.parquet")
    val maxIds = idCols.map { c =>
      c -> (src.agg(max(col(c))).collect()(0).getLong(0) + 1)
    }
    (0 until factor).map { k =>
      val shifted = maxIds.foldLeft(src) { case (df, (c, m)) =>
        df.withColumn(c, col(c) + lit(k * m))
      }
      perReplica(shifted, k)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/$name.parquet")
    // Tables caches file listings per path — a regenerated corpus under
    // the same out path must drop stale cached plans (Tables.scala doc)
    graft.core.Tables.invalidate(out)
  }

  /** Per-replica deterministic token shuffle for document text. The sort
    * key is salted with the DOC'S TEXT HASH, not just the replica: a
    * replica-only key gives every document in replica k the same token
    * order, so hash-sorted runs repeat across documents and shingle
    * collisions explode (measured at ×100: LSH candidate-pair mass grew
    * ×39,392 against ×100 rows — the corpus was manufacturing pairs the
    * doc-comment promised it wouldn't). Salting by text hash keeps the
    * promised model exactly: IDENTICAL texts (the fixture's true
    * duplicates) still shuffle identically — each replica carries the
    * original's internal duplicate structure, pairs grow linearly —
    * while DISTINCT texts get distinct orders and share no manufactured
    * shingles. */
  def shuffledText(k: Int): org.apache.spark.sql.Column = {
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
      t => length(t) > 0)
    val keyed = transform(toks,
      t => struct(xxhash64(t, lit(k), xxhash64(col("text"))).as("h"),
        t.as("t")))
    array_join(transform(array_sort(keyed), s => s.getField("t")), " ")
  }

  def documents(spark: SparkSession, out: String, factor: Int): Unit =
    replicas(spark, out, factor, "documents", Seq("doc_id")) { (df, k) =>
      if (k == 0) df else df.withColumn("text", shuffledText(k))
    }

  def embeddings(spark: SparkSession, out: String, factor: Int): Unit =
    replicas(spark, out, factor, "embeddings", Seq("vec_id"))((df, _) => df)

  def lineitem(spark: SparkSession, out: String, factor: Int): Unit =
    replicas(spark, out, factor, "lineitem", Seq("l_orderkey"))((df, _) => df)

  def events(spark: SparkSession, out: String, factor: Int): Unit =
    replicas(spark, out, factor, "events",
      Seq("event_id", "user_id"))((df, _) => df)

  def smallTables(spark: SparkSession, out: String): Unit = {
    for (t <- Seq("nation", "region", "part"))
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    graft.core.Tables.invalidate(out)
  }

  /** Orders/customer replicas (keys shifted per replica) — the KMV and
    * z-order layout rows read these. Each table's keys shift by its OWN
    * max, so cross-table key identity is not preserved; the spot tool
    * measures time, not join semantics. */
  def orders(spark: SparkSession, out: String, factor: Int): Unit =
    replicas(spark, out, factor, "orders",
      Seq("o_orderkey", "o_custkey"))((df, _) => df)

  def customer(spark: SparkSession, out: String, factor: Int): Unit =
    replicas(spark, out, factor, "customer", Seq("c_custkey"))((df, _) => df)
}
