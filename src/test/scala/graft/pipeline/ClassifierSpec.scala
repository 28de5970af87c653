package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The fastText-shaped hashed linear classifier: featurization, the
  * deterministic weight table, and the scoring contract. */
class ClassifierSpec extends SparkSpec {

  test("features = v1 unigrams + adjacent bigrams; punctuation splits first") {
    import spark.implicits._
    val f = Seq(Tuple1("Big-Data wins")).toDF("text")
      .select(Classifier.features(col("text")).as("f"))
      .collect()(0).getSeq[String](0)
    assert(f == Seq("big", "data", "wins", "big_data", "data_wins"))
    // single token → no bigrams; empty text → no features
    val one = Seq(Tuple1("spark")).toDF("text")
      .select(Classifier.features(col("text")).as("f"))
      .collect()(0).getSeq[String](0)
    assert(one == Seq("spark"))
    val none = Seq(Tuple1("!!!")).toDF("text")
      .select(Classifier.features(col("text")).as("f"))
      .collect()(0).getSeq[String](0)
    assert(none.isEmpty)
  }

  test("hashWeights: 256 buckets, integer weights in [-10, 10]") {
    val w = Classifier.hashWeights(spark).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(w.length == 256)
    assert(w.map(_._1).distinct.length == 256)
    assert(w.forall { case (b, _) => b.matches("[0-9a-f]{2}") })
    assert(w.forall { case (_, v) => v >= -10 && v <= 10 })
    // not degenerate: both signs occur
    assert(w.exists(_._2 > 0) && w.exists(_._2 < 0))
  }

  test("trainLogOdds learns weights that separate the classes") {
    val docs = spark.read.parquet(sf("documents"))
    val label = col("text").contains("spark")
    val weights = Classifier.trainLogOdds(docs, label)
    val w = weights.collect().map(r => (r.getString(0), r.getInt(1)))
    assert(w.forall { case (_, v) => v >= -10 && v <= 10 })
    assert(w.exists(_._2 > 0) && w.exists(_._2 < 0),
      "log-odds must carry signal in both directions")
    // scored on the training corpus, the positive-class mean must exceed
    // the negative-class mean by a clear margin (self-consistency, not
    // generalization)
    val scored = Classifier.score(docs, weights)
      .join(docs.select(col("doc_id"), label.as("y")), "doc_id")
    val means = scored.groupBy("y")
      .agg(avg(col("quality"))).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the seed keyword contributes a handful of features among ~120 per
    // doc, so the sigmoid-of-mean gap is inherently small — assert a
    // margin well above noise (measured ≈ 0.045 at sf0.001), not a
    // separation the architecture cannot produce
    assert(means(true) > means(false) + 0.02,
      s"positive mean ${means(true)} must clearly exceed ${means(false)}")
  }

  test("score: sigmoid of exact integer mean; all-positive beats all-negative") {
    import spark.implicits._
    // a 2-bucket weight table we control completely
    val docs = Seq((1L, "alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    val feats = docs.select(explode(Classifier.features(col("text"))).as("f"))
      .select(Classifier.bucketOf(col("f")).as("bucket"))
      .distinct().collect().map(_.getString(0))
    val weights = feats.map(b => (b, 10)).toSeq.toDF("bucket", "w")
    val r = Classifier.score(docs, weights)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    // every feature weighs 10 → mean 10 → sigmoid(10/2) for both docs
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-5.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L) == expect && r(2L) == expect)
    // unknown buckets contribute 0 but count: score 0 → sigmoid(0) = 0.5
    val empty = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        weights.schema)
    val r0 = Classifier.score(docs, empty)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
    assert(r0.forall(_._2 == 0.5))
  }
}
