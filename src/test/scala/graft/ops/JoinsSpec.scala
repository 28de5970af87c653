package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Temporal joins: as-of semantics (<=, tie handling, missing partner) and
  * bucketized range containment (boundary inclusivity, bucket spanning). */
class JoinsSpec extends SparkSpec {

  test("asOf attaches the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq((1L, 5L), (1L, 10L), (1L, 15L), (2L, 7L))
      .toDF("k", "t")
    val right = Seq((1L, 4L, 100L, 1.0), (1L, 10L, 101L, 2.0), (1L, 12L, 102L, 3.0))
      .toDF("k", "t", "rid", "v")
    val out = Joins.asOf(left, "k", "t", right, "k", "t", "rid",
        attach = Seq("rid", "v"))
      .orderBy("k", "t")
      .select("k", "t", "asof_rid", "asof_v")
      .collect()
    // t=5 → rid 100; t=10 → rid 101 (equal time IS visible); t=15 → rid 102
    assert(out(0).getLong(2) == 100L && out(0).getDouble(3) == 1.0)
    assert(out(1).getLong(2) == 101L && out(1).getDouble(3) == 2.0)
    assert(out(2).getLong(2) == 102L && out(2).getDouble(3) == 3.0)
    // key 2 has no right rows → nulls, row kept (left semantics)
    assert(out(3).isNullAt(2) && out(3).isNullAt(3))
  }

  test("asOf breaks (key,time) ties by the greatest tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 7L, 7.0), (1L, 10L, 9L, 9.0), (1L, 10L, 8L, 8.0))
      .toDF("k", "t", "rid", "v")
    val out = Joins.asOf(left, "k", "t", right, "k", "t", "rid",
      attach = Seq("rid", "v")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("asof_rid") == 9L)
  }

  test("asOf ignores right rows strictly after the left time") {
    import spark.implicits._
    val left = Seq((1L, 3L)).toDF("k", "t")
    val right = Seq((1L, 4L, 1L, 1.0)).toDF("k", "t", "rid", "v")
    val out = Joins.asOf(left, "k", "t", right, "k", "t", "rid",
      attach = Seq("rid", "v")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("asof_rid")))
  }

  test("asOf keeps a genuine NULL in an attach column (no backfill from older rows)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    // latest right row has v = NULL; a per-column last(ignoreNulls) would
    // wrongly backfill v=7.0 from the older row while taking rid=101 from
    // the newer — fields of two different rows
    val right = Seq((1L, 1L, 100L, Some(7.0)), (1L, 5L, 101L, None))
      .toDF("k", "t", "rid", "v")
    val out = Joins.asOf(left, "k", "t", right, "k", "t", "rid",
      attach = Seq("rid", "v")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("asof_rid") == 101L)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")),
      "NULL from the latest right row must survive, not be backfilled")
  }

  test("asOf rejects reserved column names on either side") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("k", "t")
    val rBad = Seq((1L, 1L, 2L, 3L)).toDF("k", "t", "rid", "_rn")
    intercept[IllegalArgumentException] {
      Joins.asOf(l, "k", "t", rBad, "k", "t", "rid", attach = Seq("_rn"))
    }
    val lBad = Seq((1L, 1L, 9L)).toDF("k", "t", "asof_v")
    val r = Seq((1L, 1L, 2L, 3.0)).toDF("k", "t", "rid", "v")
    intercept[IllegalArgumentException] {
      Joins.asOf(lBad, "k", "t", r, "k", "t", "rid", attach = Seq("v"))
    }
  }

  test("asOf matches the naive per-row definition on randomized data") {
    import spark.implicits._
    for (seed <- Seq(3, 99)) {
      val rnd = new scala.util.Random(seed)
      val leftRows = (0 until 60).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong))
      val rightRows = (0 until 80).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong, rnd.nextInt(100).toDouble))
      val left = leftRows.toDF("k", "t", "lid")
      val right = rightRows.toDF("k", "t", "rid", "v")

      val got = Joins.asOf(left, "k", "t", right, "k", "t", "rid",
          attach = Seq("rid", "v"))
        .select("lid", "asof_rid")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

      leftRows.foreach { case (k, t, lid) =>
        val candidates = rightRows.filter(r => r._1 == k && r._2 <= t)
        val expect = if (candidates.isEmpty) -1L
          else candidates.maxBy(r => (r._2, r._3))._3 // latest time, then max tiebreak
        assert(got(lid) == expect, s"seed $seed lid=$lid k=$k t=$t: got ${got(lid)}, want $expect")
      }
    }
  }

  test("rangeJoin is [lo, hi) containment across bucket boundaries") {
    import spark.implicits._
    val intervals = Seq((10L, 0L, 10L), (20L, 5L, 15L)).toDF("iid", "lo", "hi")
    val points = Seq((1L, 3L), (2L, 9L), (3L, 10L), (4L, 14L), (5L, 20L))
      .toDF("pid", "t")
    // bucketWidth 4 → every interval spans several buckets; result must be
    // exactly set containment regardless
    val got = Joins.rangeJoin(intervals, "lo", "hi", points, "t", 4L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = Set(
      (10L, 1L), (10L, 2L),            // [0,10): t=3, 9; t=10 is EXCLUDED
      (20L, 2L), (20L, 3L), (20L, 4L)) // [5,15): 9, 10, 14
    assert(got == expect)
  }

  test("fuzzyJoin1 is exact vs brute-force levenshtein on adversarial cases") {
    import spark.implicits._
    val rows = Seq(
      (1L, "widget"), (2L, "widgets"),  // insertion at end
      (3L, "widget"),                    // exact dup of 1
      (4L, "wodget"),                    // substitution mid
      (5L, "idget"),                     // deletion at front
      (6L, "gadget"),                    // distance 2 from widget — excluded
      (7L, ""), (8L, "a"),               // empty/one-char edge
      (9L, "b"))
    val df = rows.toDF("id", "s")
    val got = Fuzzy.fuzzyJoin1(df, "id", "s")
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ai, as) <- rows; (bi, bs) <- rows if ai < bi && lev(as, bs) <= 1
    } yield (ai, bi)).toSet
    assert(got == expect, s"missed=${expect -- got} extra=${got -- expect}")
  }

  test("asOfWithin nulls matches older than the tolerance") {
    import spark.implicits._
    val left = Seq((1L, "u", 100L), (2L, "u", 150L), (3L, "u", 300L))
      .toDF("id", "k", "t")
    val right = Seq((10L, "u", 95L, 1.5), (11L, "u", 140L, 2.5))
      .toDF("rid", "k", "t", "v")
    val got = Joins.asOfWithin(left, "k", "t", right, "k", "t", "rid",
        attach = Seq("rid", "v"), tolerance = 20L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    assert(got.toSeq == Seq(
      (1L, Some(10L), Some(1.5)),   // 5 behind → fresh
      (2L, Some(11L), Some(2.5)),   // 10 behind → fresh
      (3L, None, None)),            // 160 behind → stale, nulled
      s"got ${got.toSeq}")
    // tolerance attaching the time column itself survives the carry dedup
    val withT = Joins.asOfWithin(left, "k", "t", right, "k", "t", "rid",
      attach = Seq("t", "v"), tolerance = 20L).orderBy("id").collect()
    assert(Option(withT(2).get(3)).isEmpty && withT(0).getLong(3) == 95L)
  }

  test("rangeJoin drops empty/inverted intervals instead of exploding") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 10L), (2L, 12L, 8L)).toDF("iid", "lo", "hi")
    val points = Seq((1L, 10L)).toDF("pid", "t")
    assert(Joins.rangeJoin(intervals, "lo", "hi", points, "t", 4L).count() == 0)
  }
}
