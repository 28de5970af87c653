package graft.ext

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TextKernels.jaroWinkler]] to DuckDB's jaro_winkler_similarity
  * values, probed this session via the python duckdb module — the ER
  * oracle (q_er_jw) replays through DuckDB, so the kernel must agree on
  * every semantic corner: empty handling (0.0, not 1.0), the ⌊max/2⌋−1
  * match window, floor(t/2) half-transpositions, prefix cap 4, and the
  * 0.7 boost threshold (a sub-0.7 pair with a long shared prefix must
  * stay unboosted). */
class JaroWinklerSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    TextKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  private def near(x: Double, y: Double): Boolean = math.abs(x - y) < 1e-12

  test("matches DuckDB on the classic record-linkage pairs") {
    assert(near(jw("martha", "marhta"), 0.9611111111111111))
    assert(near(jw("dixon", "dicksonx"), 0.8133333333333332))
    assert(near(jw("jellyfish", "smellyfish"), 0.8962962962962964))
    assert(near(jw("dwayne", "duane"), 0.8400000000000001))
    assert(near(jw("trace", "trate"), 0.9066666666666667))
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("empty sides and window-excluded matches give 0, as in DuckDB") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window ⌊2/2⌋−1 = 0: no cross match
    assert(jw("ABC", "abc") == 0.0) // case-sensitive
  }

  test("boost applies only above the 0.7 jaro threshold, prefix capped at 4") {
    // jaro 0.6048 with a 4-char shared prefix: stays unboosted
    assert(near(jw("prefixaaaa", "prefixzzzzzzzzzzzzzzzzzzzzzz"),
      0.6047619047619047))
    // jaro 0.7222, prefix capped at 4 of 5: 0.7222 + 0.4·(1−0.7222)
    assert(near(jw("aaaaa", "a" * 10 + "b" * 20), 0.8333333333333334))
    // odd raw transposition count floors: abcde/bcaed
    assert(near(jw("abcde", "bcaed"), 0.7833333333333333))
  }
}
