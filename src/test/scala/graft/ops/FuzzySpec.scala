package graft.ops

import graft.SparkSpec

/** FastSS deletion-neighborhood join vs a driver-side brute force on shapes
  * that exercise every recall case: equality groups, substitution,
  * insertion/deletion, empty strings, and near-misses at distance 2. */
class FuzzySpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], k: Int = 1): Set[(Long, Long, Int)] = {
    import spark.implicits._
    Fuzzy.fuzzyJoinK(rows.toDF("id", "name"), "id", "name", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
  }

  private def brute(rows: Seq[(Long, String)], k: Int = 1): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= k
    } yield (ia, ib, lev(sa, sb))).toSet
  }

  test("matches brute force on all edit-distance-1 shapes") {
    val rows = Seq(
      1L -> "spark", 2L -> "spark",     // equal pair
      3L -> "sparc",                    // substitution of 1/2
      4L -> "sparks",                   // insertion
      5L -> "spak",                     // deletion
      6L -> "spoke",                    // distance 2 from spark — excluded
      7L -> "",                         // empty string
      8L -> "a",                        // 1 edit from empty
      9L -> "ab")                       // 2 edits from empty — excluded
    assert(run(rows) == brute(rows))
  }

  test("k=2 matches brute force on every two-edit shape") {
    val rows = Seq(
      1L -> "spark", 2L -> "spark",     // equal
      3L -> "spoke",                    // 2 substitutions from spark
      4L -> "sparkles",                 // 3 insertions — excluded
      5L -> "spa",                      // 2 deletions
      6L -> "parks",                    // delete head + insert tail
      7L -> "xspark",                   // 1 insertion
      8L -> "rspak",                    // transposition-ish: 2 edits
      9L -> "",                         // empty
      10L -> "ab",                      // 2 inserts from empty
      11L -> "abc",                     // 3 from empty — excluded vs 9
      12L -> "spor")                    // 3 edits from spark — excluded
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("k=2 length banding never loses a true pair (random strings)") {
    val rng = new scala.util.Random(42)
    val alphabet = "abc" // tiny alphabet → dense near-pairs
    val rows = (1L to 60L).map(i =>
      i -> (0 until (2 + rng.nextInt(5))).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString)
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("duplicate groups expand to all id pairs exactly once") {
    val rows = Seq(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y")
    val got = run(rows)
    assert(got == brute(rows))
    assert(got.count { case (_, _, d) => d == 0 } == 3) // C(3,2) for "x"
  }

  test("null strings are ignored") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, null), (3L, "abd")).toDF("id", "name")
    val got = Fuzzy.fuzzyJoin1(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L)))
  }
}
