package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deterministic sampling/shuffle/bucketing invariants. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("stratifiedSample: exact quotas, keep-all below quota, seed-stable") {
    val langs = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = langs.keys.map(_ -> 5L).toMap
    val kept = Sampling.stratifiedSample(docs, "lang", targets, "t1")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    langs.foreach { case (l, n) =>
      assert(kept(l) == math.min(5L, n), s"lang $l: ${kept(l)} of $n")
    }
    // determinism: the same seed picks the same rows; a different seed
    // (almost surely) a different set
    def ids(seed: String) = Sampling.stratifiedSample(docs, "lang", targets, seed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids("t1") == ids("t1"))
    assert(ids("t1") != ids("t2"), "reseeding did not change the draw")
  }

  test("epochShuffle: a permutation per epoch, shards partition the corpus") {
    val n = docs.count()
    val e1 = Sampling.epochShuffle(docs, 1, 4).collect()
    assert(e1.length == n)
    // (shard, pos) is a dense unique key
    val key = e1.map(r => (r.getInt(1), r.getInt(2)))
    assert(key.distinct.length == n.toInt)
    e1.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length))
    }
    // a new epoch reorders (almost surely)
    val e2 = Sampling.epochShuffle(docs, 2, 4).collect()
    val m1 = e1.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val m2 = e2.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m1 != m2, "epoch change did not permute")
  }

  test("lengthBuckets: arithmetic matches ntile, buckets ordered by length") {
    val got = Sampling.lengthBuckets(docs, 8).collect()
    // the explicit rank arithmetic must equal the engine's own ntile
    val lens = docs.select(col("doc_id").as("id"),
      size(graft.fts.Analyzer.tokenize(col("text"))).cast("long").as("len"))
    val viaNtile = lens.withColumn("bucket",
        ntile(8).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("len"), col("id"))))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"),
        min("len").as("min_len"), max("len").as("max_len"))
      .orderBy("bucket").collect()
    assert(got.length == viaNtile.length)
    got.zip(viaNtile).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2) && a.getLong(3) == b.getLong(3),
        s"bucket mismatch: $a vs $b")
    }
    // monotone: bucket i's max_len <= bucket i+1's min_len
    got.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2))
      case _ =>
    }
    // efficiency in (0, 1]
    got.foreach(r => assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0))
  }

  test("curriculum: pools widen, drawn difficulty rises, draws bounded") {
    import spark.implicits._
    val d = (0L until 100L).map(i => (i, i)).toDF("doc_id", "difficulty")
    val sched = Sampling.curriculumSchedule(d, "difficulty",
      fractions = Seq(0.2, 1.0), budget = 10, seed = "t").collect()
    assert(sched.length == 2)
    val e1 = sched(0); val e2 = sched(1)
    assert(e1.getLong(1) == 20 && e2.getLong(1) == 100) // allowed pools
    assert(e1.getLong(2) == 10 && e2.getLong(2) == 10)  // budgets met
    // epoch 1 can only see ranks <= 20; epoch 2's draw reaches deeper
    assert(e1.getLong(4) <= 20)
    assert(e2.getLong(4) > 20, s"epoch 2 never left the easy pool: $e2")
    assert(e2.getDouble(3) > e1.getDouble(3), "difficulty must rise")
  }

  test("weightedSample: heavier rows win more often; deterministic; total") {
    import spark.implicits._
    // two-point weights: ids 0..99 weight 1, ids 100..199 weight 50 —
    // the A-ES draw of 50 must be dominated by the heavy half
    val d = (0L until 200L).map(i => (i, if (i < 100) 1L else 50L))
      .toDF("doc_id", "wt")
    val picked = Sampling.weightedSample(d, "wt", 50, "s")
      .collect().map(_.getLong(0))
    assert(picked.length == 50)
    val heavy = picked.count(_ >= 100)
    assert(heavy >= 40, s"heavy half underdrawn: $heavy of 50")
    // same seed → same draw; n >= corpus → everything
    val again = Sampling.weightedSample(d, "wt", 50, "s")
      .collect().map(_.getLong(0))
    assert(picked.toSeq == again.toSeq)
    assert(Sampling.weightedSample(d, "wt", 500, "s").count() == 200)
  }

  test("preferencePairs: margin filters, chosen beats rejected, ties on id") {
    import spark.implicits._
    val d = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 10L),  // tie on top: id 1 wins
      ("b", 4L, 50L), ("b", 5L, 45L),                    // gap 5 < margin
      ("c", 6L, 99L)                                     // singleton: no pair
    ).toDF("grp", "doc_id", "score")
    val pairs = Sampling.preferencePairs(d, Seq("grp"), "score", margin = 20L)
      .collect()
    assert(pairs.length == 1)
    val p = pairs(0)
    assert(p.getAs[String]("grp") == "a")
    assert(p.getAs[Long]("chosen_id") == 1L)   // tie broken by id asc
    assert(p.getAs[Long]("rejected_id") == 3L)
    assert(p.getAs[Long]("gap") == 90L)
  }
}
