package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The in-JVM corpus-rewrite contract (r16 verdict item 1): every serving
  * cache derived from a corpus dir — cached frames, registered views, and
  * the dir-md5-keyed Scratch layouts (trained embedding space, FTS serving
  * index/df stats, bucketed edge layout) — must drop on
  * [[Tables.invalidate]], because the layout keys hash the PATH, not the
  * content. Before this round, a tool that regenerated a corpus under an
  * existing path and then drove an embed/FTS-skew query in the same JVM
  * was served the STALE trained space with no error. */
class LayoutInvalidationSpec extends SparkSpec {

  test("registerLayout thunks run exactly once per invalidate, keyed by dir") {
    var dropsA = 0
    var dropsB = 0
    Scratch.registerLayout("/tmp/li_corpus_a", "layout_x")(() => dropsA += 1)
    Scratch.registerLayout("/tmp/li_corpus_a", "layout_x")(() => dropsA += 1)
    Scratch.registerLayout("/tmp/li_corpus_b", "layout_x")(() => dropsB += 1)
    Scratch.invalidateLayouts("/tmp/li_corpus_a")
    assert(dropsA == 1, "re-registration must be idempotent (latest thunk only)")
    assert(dropsB == 0, "another dir's layouts must survive")
    Scratch.invalidateLayouts("/tmp/li_corpus_a")
    assert(dropsA == 1, "invalidate must deregister (no double drop)")
    Scratch.invalidateLayouts("/tmp/li_corpus_b")
    assert(dropsB == 1)
  }

  test("a failing drop thunk must not block the others") {
    var dropped = false
    Scratch.registerLayout("/tmp/li_corpus_c", "boom")(() =>
      throw new RuntimeException("synthetic drop failure"))
    Scratch.registerLayout("/tmp/li_corpus_c", "fine")(() => dropped = true)
    Scratch.invalidateLayouts("/tmp/li_corpus_c")
    assert(dropped)
  }

  test("regenerating a corpus under the same path retrains the embed layout") {
    val dir = Scratch.dir("layout_inval_corpus")
    def write(mark: Option[String]): Unit = {
      val base = spark.read.parquet(sf("documents")).filter(col("doc_id") < 120)
      val docs = mark.fold(base)(m =>
        base.withColumn("text", concat(col("text"), lit(s" $m $m"))))
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    def terms(): Set[String] = {
      val df = graft.SparkEntry.queries("q_text_embed_train")(spark, dir)
      df.select("term").distinct().collect().map(_.getString(0)).toSet
    }
    write(None)
    val v1 = terms()
    assert(!v1.contains("zyzzyva"), "marker must be absent from corpus v1")

    // rewrite the corpus IN PLACE with a new high-frequency vocabulary term
    write(Some("zyzzyva"))

    // without invalidation the PATH-keyed layout serves the stale space —
    // this assertion is what makes the test sensitive to the cache at all
    assert(terms() == v1,
      "without invalidate the layout must (still) serve the v1 space")

    Tables.invalidate(dir)
    val v2 = terms()
    assert(v2.contains("zyzzyva"),
      "invalidate must drop the trained layout so the next query retrains " +
        "on the rewritten corpus")

    Tables.invalidate(dir)
    Scratch.deleteLocal(dir)
  }
}
