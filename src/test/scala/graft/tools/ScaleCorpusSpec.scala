package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the replica growth model's contract after the round-15 fix:
  * the token shuffle must preserve each document's token MULTISET,
  * shuffle IDENTICAL texts identically (replicas keep the original's
  * true-duplicate structure), and give DISTINCT texts distinct orders
  * (no manufactured cross-document shingle runs — the defect that
  * inflated LSH candidate-pair mass ×39,392 at ×100). */
class ScaleCorpusSpec extends SparkSpec {

  test("doc-salted shuffle: multiset preserved, duplicates aligned, " +
       "distinct texts diverge") {
    import org.apache.spark.sql.Row
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // true dup of 0
      (2L, "theta eta zeta epsilon delta gamma beta alpha"), // same multiset, distinct text
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val shuffled = docs.select(col("doc_id"),
        ScaleCorpus.shuffledText(k = 3).as("s"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    def toks(s: String) = s.split(" ").toSeq
    // multiset preserved for every doc
    shuffled.values.foreach { case (s, orig) =>
      assert(toks(s).sorted == toks(orig).sorted,
        s"token multiset must be preserved: $orig -> $s")
    }
    // identical texts -> identical shuffles (duplicate structure kept)
    assert(shuffled(0L)._1 == shuffled(1L)._1,
      "true duplicates must stay duplicates under the shuffle")
    // distinct texts (even with the same multiset) -> distinct orders
    assert(shuffled(0L)._1 != shuffled(2L)._1,
      "distinct texts must not be forced into one shared token order")
    // and the shuffle actually shuffles (k-salted, not identity)
    assert(shuffled(0L)._1 != shuffled(0L)._2 ||
           shuffled(3L)._1 != shuffled(3L)._2,
      "the replica shuffle must permute at least some documents")
  }
}
