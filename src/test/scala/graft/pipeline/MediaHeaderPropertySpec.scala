package graft.pipeline

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property for the REAL header codecs: generate random
  * dimensions, render a spec-correct container (PNG/JPEG/GIF/WAV), parse
  * it back, require exact equality — plus prefix-truncation never parses
  * to a WRONG answer (either the right one, if the header survived, or
  * none). Pure JVM — no Spark session. */
class MediaHeaderPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val ran = (0 until n).count { i =>
      g.apply(Gen.Parameters.default, Seed(1717L + i)) match {
        case Some(a) => f(a); true
        case None => false
      }
    }
    assert(ran >= n / 2, s"generator produced only $ran/$n values")
  }

  private val dims: Gen[(Int, Int)] = for {
    w <- Gen.chooseNum(1, 65535)
    h <- Gen.chooseNum(1, 65535)
  } yield (w, h)

  test("image dims round-trip for every format over random dimensions") {
    forAll(dims) { case (w, h) =>
      assert(Multimodal.imageDims(Multimodal.pngBytes(w, h)) == Some(("png", w, h)))
      assert(Multimodal.imageDims(Multimodal.jpegBytes(w, h)) == Some(("jpeg", w, h)))
      assert(Multimodal.imageDims(Multimodal.gifBytes(w, h)) == Some(("gif", w, h)))
    }
    // PNG dims are 32-bit: exercise beyond u16
    assert(Multimodal.imageDims(Multimodal.pngBytes(1 << 20, 3)) ==
      Some(("png", 1 << 20, 3)))
  }

  test("truncated headers never parse to a WRONG answer") {
    forAll(for { d <- dims; cut <- Gen.chooseNum(0, 40) } yield (d, cut)) {
      case ((w, h), cut) =>
        for ((full, fmt) <- Seq(
            (Multimodal.pngBytes(w, h), "png"),
            (Multimodal.jpegBytes(w, h), "jpeg"),
            (Multimodal.gifBytes(w, h), "gif"))) {
          val parsed = Multimodal.imageDims(full.take(math.min(cut, full.length)))
          assert(parsed.isEmpty || parsed.contains((fmt, w, h)),
            s"truncation must not misparse: $fmt $w x $h cut=$cut -> $parsed")
        }
    }
  }

  test("wav info round-trips over random ids and rejects corrupt sizes") {
    forAll(Gen.chooseNum(0L, 100000L)) { id =>
      val expectRate = if (id % 2 == 0) 16000 else 44100
      val expectCh = (id % 2 + 1).toInt
      assert(Multimodal.wavInfo(Multimodal.synthWav(id)) ==
        Some((expectRate, expectCh, 16, id % 1000 + 1)))
    }
    // a fmt chunk claiming blockAlign 0 must not divide-by-zero
    val bad = Multimodal.synthWav(2L)
    bad(32) = 0; bad(33) = 0 // blockAlign field inside fmt
    assert(Multimodal.wavInfo(bad).isEmpty)
  }
}
