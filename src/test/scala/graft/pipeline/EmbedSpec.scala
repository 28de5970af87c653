package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Embedding-trainer quality: on a corpus with KNOWN topical structure
  * (two disjoint vocabularies that never co-occur), the trained PPMI
  * vectors must place every word's nearest neighbor inside its own
  * topic, and cross-topic similarity must be exactly zero (disjoint
  * PPMI support). Also pins the output contract the oracle row
  * (q_text_embed_train) relies on: one row per vocabulary term, `dims`
  * vector entries, unit-norm power-method direction. */
class EmbedSpec extends SparkSpec {

  private val topicA = Seq("red", "green", "blue", "yellow", "pink")
  private val topicB = Seq("dog", "cat", "fox", "wolf", "bear")

  private def clusteredDocs = {
    import spark.implicits._
    (0 until 120).map { i =>
      val topic = if (i < 60) topicA else topicB
      (i.toLong, (0 until 20).map(j => topic((i + j) % 5)).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("co-occurrence is additive across doc batches: incremental == batch, bit-for-bit") {
    import spark.implicits._
    val docs = clusteredDocs
    val batchA = docs.filter(col("doc_id") < 40)
    val batchB = docs.filter(col("doc_id") >= 40)
    // the StreamEmbed contract without the stream: per-batch deltas
    // unioned and folded must train the identical space
    val folded = Embed.cooccurrence(batchA)
      .unionByName(Embed.cooccurrence(batchB))
      .groupBy("a", "b").agg(sum(col("cab")).as("cab"))
    val inc = Embed.trainFromCooc(folded)
      .select("term", "vec", "pc1").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1), r.getDouble(2)))
    val bat = Embed.trainPpmiEmbeddings(docs)
      .select("term", "vec", "pc1").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1), r.getDouble(2)))
    assert(inc.toSeq == bat.toSeq,
      "incrementally folded counts must train the batch space exactly")
  }

  private def cos(x: Seq[Double], y: Seq[Double]): Double = {
    val dot = x.lazyZip(y).map(_ * _).sum
    val nx = math.sqrt(x.map(v => v * v).sum)
    val ny = math.sqrt(y.map(v => v * v).sum)
    if (nx == 0 || ny == 0) 0.0 else dot / (nx * ny)
  }

  test("nearest trained neighbor stays inside the topic; cross-topic " +
       "similarity is zero") {
    val emb = Embed.trainPpmiEmbeddings(clusteredDocs, window = 2,
      dims = 8, powerIters = 3)
    val rows = emb.collect()
    assert(rows.length == 10, "one row per vocabulary term")
    val vecs = rows.map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(vecs.values.forall(_.length == 8), "dims entries per vector")
    (topicA ++ topicB).foreach { w =>
      val topic = if (topicA.contains(w)) topicA else topicB
      val other = if (topicA.contains(w)) topicB else topicA
      val nn = vecs.keys.filter(_ != w).maxBy(o => cos(vecs(w), vecs(o)))
      assert(topic.contains(nn),
        s"$w's nearest neighbor $nn crossed topics")
      other.foreach(o => assert(cos(vecs(w), vecs(o)) == 0.0,
        s"cross-topic similarity $w/$o must be exactly 0 (disjoint PPMI)"))
      topic.filter(_ != w).foreach(o =>
        assert(cos(vecs(w), vecs(o)) > 0.0,
          s"within-topic similarity $w/$o must be positive"))
    }
  }

  test("power-method direction is unit-norm and nonnegative") {
    val emb = Embed.trainPpmiEmbeddings(clusteredDocs, window = 2,
      dims = 8, powerIters = 3)
    val pc1 = emb.select(col("pc1")).collect().map(_.getDouble(0))
    assert(pc1.forall(_ >= 0.0),
      "PPMI >= 0 and a positive start keep the iterate nonnegative")
    val norm = math.sqrt(pc1.map(v => v * v).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"expected unit L2, got $norm")
  }

  test("the engine-side cosine column agrees with the local computation") {
    val emb = Embed.trainPpmiEmbeddings(clusteredDocs, window = 2,
      dims = 8, powerIters = 3).persist()
    try {
      val a = emb.select(col("term").as("ta"), col("vec").as("va"))
      val b = emb.select(col("term").as("tb"), col("vec").as("vb"))
      val engine = a.crossJoin(b).filter(col("ta") < col("tb"))
        .select(col("ta"), col("tb"),
          round(Embed.cosine(col("va"), col("vb")), 9).as("c"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      val vecs = emb.collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      engine.foreach { case ((ta, tb), c) =>
        val local = BigDecimal(cos(vecs(ta), vecs(tb)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(c - local) < 1e-8, s"cosine mismatch $ta/$tb")
      }
    } finally emb.unpersist()
  }
}
