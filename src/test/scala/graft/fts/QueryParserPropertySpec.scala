package graft.fts

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.fts.QueryParser._

/** Round-trip property for the query-string grammar: render a random AST
  * to the surface syntax, parse it back, require structural equality.
  * Catches precedence drift, lexer/renderer asymmetries, and silent
  * normalization of any construct (boosts, fuzzy suffixes, wildcards,
  * NEAR) across grammar changes. Pure JVM — no Spark session. */
class QueryParserPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 120)(f: A => Unit): Unit = {
    val ran = (0 until n).count { i =>
      g.apply(Gen.Parameters.default, Seed(4242L + i)) match {
        case Some(a) => f(a); true
        case None => false
      }
    }
    assert(ran >= n / 2, s"generator produced only $ran/$n values")
  }

  private val term = Gen.oneOf("data", "query", "vector", "spark", "stream", "merge")
  private val weight = Gen.oneOf(0.5, 1.5, 2.0, 3.0)

  private val leaf: Gen[Node] = Gen.oneOf(
    term.map(Term(_)),
    Gen.choose(1, 3).flatMap(k => Gen.listOfN(k, term)).map(Phrase(_)),
    term.map(t => Prefix(t.take(3))),
    Gen.oneOf(Wildcard("qu*ry"), Wildcard("*ream"), Wildcard("dat*a")),
    Gen.zip(term, Gen.oneOf(1, 2)).map { case (t, k) => Fuzzy(t, k) },
    Gen.zip(term, term, Gen.choose(1, 4)).map { case (a, b, k) => Near(a, b, k) },
    // lo < hi guaranteed by sorting two distinct terms
    Gen.zip(term, term, Gen.oneOf(true, false), Gen.oneOf(true, false))
      .suchThat { case (a, b, _, _) => a != b }
      .map { case (a, b, il, ih) =>
        val Seq(lo, hi) = Seq(a, b).sorted
        TermRange(lo, hi, il, ih)
      })

  // field scopes wrap unboosted, unscoped clauses (nesting and scoped
  // boosts are rejected by the parser's validate pass)
  private val scopable: Gen[Node] = Gen.frequency(
    4 -> leaf,
    1 -> Gen.zip(Gen.oneOf("title", "source"), leaf)
      .map { case (f, n) => Scoped(f, n) })

  // boosts only attach to scoring clauses (terms/phrases) in the grammar
  private val boostable: Gen[Node] = Gen.frequency(
    3 -> leaf,
    1 -> Gen.zip(Gen.oneOf(term.map(Term(_): Node),
        Gen.listOfN(2, term).map(Phrase(_): Node)), weight)
      .map { case (n, w) => Boosted(n, w) })

  private def node(depth: Int): Gen[Node] =
    if (depth <= 0) Gen.frequency(3 -> boostable, 1 -> scopable)
    else Gen.frequency(
      3 -> boostable,
      1 -> scopable,
      2 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (l, r) => AndN(l, r) },
      2 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (l, r) => OrN(l, r) },
      1 -> node(depth - 1).map(NotN(_)))

  private def render(n: Node): String = n match {
    case Term(t) => t
    case Phrase(ts) => "\"" + ts.mkString(" ") + "\""
    case Prefix(p) => p + "*"
    case Wildcard(pat) => pat
    case Fuzzy(t, k) => s"$t~$k"
    case Near(a, b, k) => s"($a NEAR/$k $b)"
    case Boosted(inner, w) => render(inner) + "^" + w
    case Scoped(f, inner) => s"$f:(${render(inner)})"
    case TermRange(lo, hi, il, ih) =>
      (if (il) "[" else "{") + s"$lo TO $hi" + (if (ih) "]" else "}")
    case AndN(l, r) => s"(${render(l)} AND ${render(r)})"
    case OrN(l, r) => s"(${render(l)} OR ${render(r)})"
    case NotN(x) => s"(NOT ${render(x)})"
  }

  test("parse(render(ast)) == ast for random query ASTs") {
    forAll(node(3)) { ast =>
      val q = render(ast)
      val back = parse(q)
      assert(back == ast, s"round-trip diverged for: $q\n  got $back\n  want $ast")
    }
  }

  test("scoringWeights is stable through a render/parse round-trip") {
    forAll(node(3)) { ast =>
      val back = parse(render(ast))
      assert(QueryParser.scoringWeights(back) == QueryParser.scoringWeights(ast))
    }
  }
}
