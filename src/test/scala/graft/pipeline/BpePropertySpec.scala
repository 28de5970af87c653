package graft.pipeline

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM properties of the BPE kernel (no Spark session): encoding
  * must round-trip EVERY word under ANY merge table, never grow the
  * piece count, and be deterministic — the invariants the q_text_bpe
  * verdict row asserts corpus-wide, here exercised over random words and
  * random (including degenerate/unlearnable) merge tables. */
class BpePropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val ran = (0 until n).count { i =>
      g.apply(Gen.Parameters.default, Seed(1337L + i)) match {
        case Some(a) => f(a); true
        case None => false
      }
    }
    assert(ran >= n / 2, s"generator produced only $ran/$n values")
  }

  private val word: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  private val piece: Gen[String] =
    Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  private val merges: Gen[Seq[(String, String)]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.zip(piece, piece)))

  test("encodeWord round-trips under arbitrary merge tables") {
    forAll(Gen.zip(word, merges)) { case (w, ms) =>
      val pieces = Bpe.encodeWord(w, ms)
      assert(pieces.mkString("") == w, s"'$w' under $ms → $pieces")
      assert(pieces.nonEmpty && pieces.size <= w.length)
    }
  }

  test("encodeWord composes by table prefix (greedy-by-rank semantics)") {
    // encoding under [m1..mn] == encode under [m1..mk], then apply
    // [mk+1..mn] to the pieces — the sequential-fold contract that
    // distinguishes greedy-by-rank BPE from lowest-rank-first iteration
    // (the two differ on tables where a later merge builds an earlier
    // merge's operands; the learned tables of `train` are always
    // prefix-consistent, random tables here include the adversarial case)
    def applyOne(ps: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < ps.length) {
        if (i + 1 < ps.length && ps(i) == l && ps(i + 1) == r) {
          out += l + r; i += 2
        } else { out += ps(i); i += 1 }
      }
      out.toSeq
    }
    forAll(Gen.zip(word, merges, Gen.choose(0, 8))) { case (w, ms, k0) =>
      val k = math.min(k0, ms.size)
      val viaPrefix = ms.drop(k).foldLeft(Bpe.encodeWord(w, ms.take(k))) {
        case (ps, (l, r)) => applyOne(ps, l, r)
      }
      assert(viaPrefix == Bpe.encodeWord(w, ms))
    }
  }
}
