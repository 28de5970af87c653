package graft.ext

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — public domain), implemented from the
  * published rule lists. This is the full-strength English stemmer slot of
  * the analyzer chain (Lucene's PorterStemFilter position); the LIGHT slot
  * is Harman's S-stemmer ([[graft.fts.AnalyzerConfig]] `sStem`), which only
  * conflates plurals. Porter additionally folds derivational morphology:
  * relational→relate, formaliti→formal, hopefulness→hope.
  *
  * Scope contract: the algorithm is defined over lowercase a–z words. The
  * frozen v1 token grammar emits [a-z0-9]+ tokens; any token containing a
  * digit, and any token of length ≤ 2, is returned UNCHANGED (Porter's own
  * `if (k > 1)` guard). Within each step the longest matching suffix is
  * selected and its rule alone fires — if its condition fails, no other
  * rule of that step applies (that is why "rational" survives step 2
  * unchanged: ATIONAL matches, m(r)=0 fails, TIONAL is never tried).
  *
  * One compiled JVM call per word — [[PorterStemExpr]] for a scalar column,
  * [[PorterStemArrayExpr]] mapped over a token array in a single call (the
  * analyzer-chain form; a per-element HOF lambda would be interpreted).
  *
  * Reference seeds for the analyzer-stage slot: StopWordsRemover
  * (mllib ml/feature/StopWordsRemover.scala:35) is the reference's only
  * shipped analysis stage; it has no stemmer — this is the novel layer.
  */
object PorterStemmer {

  /** Stem one lowercase word. Tokens with non-[a-z] chars or length ≤ 2
    * come back unchanged. */
  def stem(w: String): String = {
    val n = w.length
    if (n <= 2) return w
    var i = 0
    while (i < n) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') return w
      i += 1
    }
    val b = w.toCharArray
    val k = run(b, n - 1)
    // steps can rewrite in place without shortening (y→i), so compare
    // content, not just length
    val r = new String(b, 0, k + 1)
    if (r == w) w else r
  }

  def stemUtf8(s: UTF8String): UTF8String = {
    val w = s.toString
    val r = stem(w)
    if (r eq w) s else UTF8String.fromString(r)
  }

  /** Stem every element of a token array in one compiled call. NULL
    * elements pass through (the grammar never emits them, but array
    * literals can). */
  def stemArray(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i)) null else stemUtf8(a.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- the algorithm, over b(0..k); returns the new k ----------------

  private def cons(b: Array[Char], i: Int): Boolean = b(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(b, i - 1)
    case _ => true
  }

  /** The measure m of b(0..j): [C](VC)^m[V]. */
  private def measure(b: Array[Char], j: Int): Int = {
    var n = 0
    var i = 0
    while (i <= j && cons(b, i)) i += 1
    while (i <= j) {
      while (i <= j && !cons(b, i)) i += 1
      if (i > j) return n
      n += 1
      while (i <= j && cons(b, i)) i += 1
    }
    n
  }

  private def vowelInStem(b: Array[Char], j: Int): Boolean = {
    var i = 0
    while (i <= j) { if (!cons(b, i)) return true; i += 1 }
    false
  }

  private def doublec(b: Array[Char], i: Int): Boolean =
    i >= 1 && b(i) == b(i - 1) && cons(b, i)

  /** *o: b(i-2..i) is cvc and the final c is not w, x or y. */
  private def cvc(b: Array[Char], i: Int): Boolean =
    i >= 2 && cons(b, i) && !cons(b, i - 1) && cons(b, i - 2) &&
      b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

  /** Mutable cursor state threaded through the steps: k = word end,
    * j = stem end of the last matched suffix. */
  private final class S(var k: Int, var j: Int)

  private def ends(b: Array[Char], s: S, suf: String): Boolean = {
    val l = suf.length
    if (l > s.k + 1) return false
    var i = 0
    while (i < l) {
      if (b(s.k - l + 1 + i) != suf.charAt(i)) return false
      i += 1
    }
    s.j = s.k - l
    true
  }

  private def setto(b: Array[Char], s: S, suf: String): Unit = {
    var i = 0
    while (i < suf.length) { b(s.j + 1 + i) = suf.charAt(i); i += 1 }
    s.k = s.j + suf.length
  }

  private def replaceIfM(b: Array[Char], s: S, suf: String): Unit =
    if (measure(b, s.j) > 0) setto(b, s, suf)

  private def run(b: Array[Char], k0: Int): Int = {
    val s = new S(k0, 0)
    step1ab(b, s); step1c(b, s); step2(b, s); step3(b, s); step4(b, s)
    step5(b, s)
    s.k
  }

  /** Plurals and -ed/-ing: SSES→SS, IES→I, S→∅; (m>0)EED→EE;
    * (*v*)ED/ING→∅ then AT→ATE, BL→BLE, IZ→IZE, undouble (not l/s/z),
    * or (m=1, *o) +E. */
  private def step1ab(b: Array[Char], s: S): Unit = {
    if (b(s.k) == 's') {
      if (ends(b, s, "sses")) s.k -= 2
      else if (ends(b, s, "ies")) setto(b, s, "i")
      else if (b(s.k - 1) != 's') s.k -= 1
    }
    if (ends(b, s, "eed")) {
      if (measure(b, s.j) > 0) s.k -= 1
    } else if ((ends(b, s, "ed") || ends(b, s, "ing")) &&
        vowelInStem(b, s.j)) {
      s.k = s.j
      if (ends(b, s, "at")) setto(b, s, "ate")
      else if (ends(b, s, "bl")) setto(b, s, "ble")
      else if (ends(b, s, "iz")) setto(b, s, "ize")
      else if (doublec(b, s.k)) {
        val c = b(s.k)
        if (c != 'l' && c != 's' && c != 'z') s.k -= 1
      } else if (measure(b, s.k) == 1 && cvc(b, s.k)) {
        s.j = s.k
        setto(b, s, "e")
      }
    }
  }

  /** (*v*) Y → I. */
  private def step1c(b: Array[Char], s: S): Unit =
    if (ends(b, s, "y") && vowelInStem(b, s.j)) b(s.k) = 'i'

  /** Double to single suffix, m > 0 (longest match fires alone). */
  private def step2(b: Array[Char], s: S): Unit = {
    if (ends(b, s, "ational")) replaceIfM(b, s, "ate")
    else if (ends(b, s, "tional")) replaceIfM(b, s, "tion")
    else if (ends(b, s, "enci")) replaceIfM(b, s, "ence")
    else if (ends(b, s, "anci")) replaceIfM(b, s, "ance")
    else if (ends(b, s, "izer")) replaceIfM(b, s, "ize")
    else if (ends(b, s, "abli")) replaceIfM(b, s, "able")
    else if (ends(b, s, "alli")) replaceIfM(b, s, "al")
    else if (ends(b, s, "entli")) replaceIfM(b, s, "ent")
    else if (ends(b, s, "eli")) replaceIfM(b, s, "e")
    else if (ends(b, s, "ousli")) replaceIfM(b, s, "ous")
    else if (ends(b, s, "ization")) replaceIfM(b, s, "ize")
    else if (ends(b, s, "ation")) replaceIfM(b, s, "ate")
    else if (ends(b, s, "ator")) replaceIfM(b, s, "ate")
    else if (ends(b, s, "alism")) replaceIfM(b, s, "al")
    else if (ends(b, s, "iveness")) replaceIfM(b, s, "ive")
    else if (ends(b, s, "fulness")) replaceIfM(b, s, "ful")
    else if (ends(b, s, "ousness")) replaceIfM(b, s, "ous")
    else if (ends(b, s, "aliti")) replaceIfM(b, s, "al")
    else if (ends(b, s, "iviti")) replaceIfM(b, s, "ive")
    else if (ends(b, s, "biliti")) replaceIfM(b, s, "ble")
  }

  /** -ic-, -full, -ness etc., m > 0. */
  private def step3(b: Array[Char], s: S): Unit = {
    if (ends(b, s, "icate")) replaceIfM(b, s, "ic")
    else if (ends(b, s, "ative")) replaceIfM(b, s, "")
    else if (ends(b, s, "alize")) replaceIfM(b, s, "al")
    else if (ends(b, s, "iciti")) replaceIfM(b, s, "ic")
    else if (ends(b, s, "ical")) replaceIfM(b, s, "ic")
    else if (ends(b, s, "ful")) replaceIfM(b, s, "")
    else if (ends(b, s, "ness")) replaceIfM(b, s, "")
  }

  /** Strip remaining standard suffixes at m > 1. */
  private def step4(b: Array[Char], s: S): Unit = {
    val matched =
      ends(b, s, "al") || ends(b, s, "ance") || ends(b, s, "ence") ||
      ends(b, s, "er") || ends(b, s, "ic") || ends(b, s, "able") ||
      ends(b, s, "ible") || ends(b, s, "ant") || ends(b, s, "ement") ||
      ends(b, s, "ment") || ends(b, s, "ent") ||
      (ends(b, s, "ion") && s.j >= 0 && (b(s.j) == 's' || b(s.j) == 't')) ||
      ends(b, s, "ou") || ends(b, s, "ism") || ends(b, s, "ate") ||
      ends(b, s, "iti") || ends(b, s, "ous") || ends(b, s, "ive") ||
      ends(b, s, "ize")
    if (matched && measure(b, s.j) > 1) s.k = s.j
  }

  /** (m>1)E→∅; (m=1, not *o)E→∅; (m>1, *d, L) undouble. */
  private def step5(b: Array[Char], s: S): Unit = {
    s.j = s.k
    if (b(s.k) == 'e') {
      val a = measure(b, s.k)
      if (a > 1 || (a == 1 && !cvc(b, s.k - 1))) s.k -= 1
    }
    if (b(s.k) == 'l' && doublec(b, s.k) && measure(b, s.k) > 1) s.k -= 1
  }
}

/** `porter_stem(token)` — one compiled stem call per row. */
case class PorterStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"porter_stem requires STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    PorterStemmer.stemUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.PorterStemmer$$.MODULE$$.stemUtf8($c);")
  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

/** Porter over a whole token array in ONE compiled call — the analyzer
  * chain's form (a `transform(toks, …)` lambda would re-enter interpreted
  * eval per element). */
case class PorterStemArrayExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "porter_stem_all"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"porter_stem_all requires ARRAY<STRING>, got ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    PorterStemmer.stemArray(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.PorterStemmer$$.MODULE$$.stemArray($c);")
  override protected def withNewChildInternal(newChild: Expression): PorterStemArrayExpr =
    copy(child = newChild)
}
