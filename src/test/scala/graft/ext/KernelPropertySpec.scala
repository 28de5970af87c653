package graft.ext

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native kernels against straightforward reference
  * implementations (scala collections), so the optimized loops can't drift
  * from the semantics. Pure JVM — no Spark session needed. */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    val ran = (0 until n).count { i =>
      g.apply(Gen.Parameters.default, Seed(1337L + i)) match {
        case Some(a) => f(a); true
        case None => false
      }
    }
    // a filtered generator must not silently turn the test into a no-op
    assert(ran >= n / 2, s"generator produced only $ran/$n values")
  }

  private val longSet = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct)

  test("intersectCard == set intersection, sorted or not") {
    forAll(Gen.zip(longSet, longSet)) { case (a, b) =>
      val expect = a.toSet.intersect(b.toSet).size.toLong
      val sortedGot = TextKernels.intersectCard(
        new GenericArrayData(a.sorted.toArray),
        new GenericArrayData(b.sorted.toArray))
      assert(sortedGot == expect, s"sorted: a=$a b=$b")
      val unsortedGot = TextKernels.intersectCard(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(unsortedGot == expect, s"unsorted: a=$a b=$b")
    }
  }

  private val vec = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 10.0))

  test("dot == left-fold sum of products") {
    forAll(Gen.zip(vec, vec)) { case (a, b) =>
      val expect = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val got = VecKernels.dot(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(got == expect, s"a=$a b=$b") // exact: same op order, same doubles
    }
  }

  test("lshBucket == sign pattern of lshProjs") {
    forAll(vec) { v =>
      val arr = new GenericArrayData(v.toArray)
      val projs = VecKernels.lshProjs(arr, 12)
      val expect = (0 until 12).foldLeft(0L) { (acc, p) =>
        if (projs.getDouble(p) > 0) acc | (1L << p) else acc
      }
      assert(VecKernels.lshBucket(arr, 12) == expect)
    }
  }

  test("phrase-slop kernel == brute-force increasing-chain reference") {
    import org.apache.spark.unsafe.types.UTF8String
    // tiny alphabet so repeats and near-misses are common
    val tok = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.listOfN(12, tok).map(_.mkString(" "))
    val phrase = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, tok))
    val slop = Gen.chooseNum(0, 3)
    def ref(toks: Seq[String], terms: Seq[String], k: Int): Boolean = {
      val window = terms.size - 1 + k
      // all increasing position chains, slot by slot
      def chains(slot: Int, from: Int): Seq[Seq[Int]] =
        if (slot == terms.size) Seq(Nil)
        else (from until toks.size).filter(toks(_) == terms(slot))
          .flatMap(p => chains(slot + 1, p + 1).map(p +: _))
      chains(0, 0).exists(c => c.last - c.head <= window)
    }
    forAll(Gen.zip(doc, phrase, slop), n = 120) { case (d, p, k) =>
      val got = FtsPhraseSlopTokens.eval(UTF8String.fromString(d),
        p.map(UTF8String.fromString).toArray, k)
      val want = ref(d.split(" ").toSeq, p, k)
      assert(got == want, s"doc='$d' phrase=$p slop=$k: got $got want $want")
    }
  }

  test("shingleHashes output is sorted, distinct, and n-gram counted") {
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val text = Gen.listOf(word).map(_.mkString(" "))
    forAll(text) { t =>
      val hs = TextKernels.shingleHashes(UTF8String.fromString(t), 3)
      val arr = (0 until hs.numElements()).map(hs.getLong)
      assert(arr == arr.sorted, s"must be ascending: $t")
      assert(arr.distinct == arr, s"must be distinct: $t")
      val nToks = t.split(" ").count(_.nonEmpty)
      assert(arr.size <= math.max(0, nToks - 2), s"at most n-2 trigrams: $t")
    }
  }
}
