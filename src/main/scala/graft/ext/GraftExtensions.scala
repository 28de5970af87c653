package graft.ext

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the frozen token grammar (graft.fts
  * .Analyzer semantics: lowercase, split on runs of non-[a-z0-9], drop
  * empties). Counterpart of the reference's in-SQL tokenizer `Sentences`
  * (reference stringExpressions.scala:1393) and ml `Tokenizer`
  * (ml/feature/Tokenizer.scala:32), but implemented with whole-stage
  * codegen (`doGenCode` calls the static eval — one virtual call per row,
  * no interpreted expression tree). */
case class FtsTokenize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fts_tokenize requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "fts_tokenize"

  override def nullSafeEval(input: Any): Any =
    FtsTokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // MODULE$ access: the companion class suppresses static forwarders
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.FtsTokenize$$.MODULE$$.tokenize($c);")

  override protected def withNewChildInternal(newChild: Expression): FtsTokenize =
    copy(child = newChild)
}

object FtsTokenize {
  private val splitter = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** Static kernel shared by interpreted eval and generated code. */
  def tokenize(s: UTF8String): ArrayData = {
    val lower = s.toString.toLowerCase(Locale.ROOT)
    val parts = splitter.split(lower)
    val out = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out.add(UTF8String.fromString(parts(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** CJK-aware tokenizer kernel: Latin/digit runs become lowercase word
  * tokens (v1 grammar), runs of CJK codepoints (unified ideographs,
  * kana, hangul, compatibility + extension blocks) become overlapping
  * CHARACTER BIGRAMS — the standard no-dictionary segmentation for
  * languages without word delimiters (the approach of Lucene's CJKAnalyzer;
  * the reference's own `Sentences` expression is locale-aware but
  * word-oriented, stringExpressions.scala:1393). A 1-character CJK run
  * emits the single character. Used by [[graft.fts.Analyzer.tokenizeWith]]
  * when `AnalyzerConfig.cjkBigrams` is set; not SQL-registered. */
case class FtsTokenizeCjk(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fts_tokenize_cjk requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "fts_tokenize_cjk"
  override def nullSafeEval(input: Any): Any =
    FtsTokenizeCjk.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.FtsTokenizeCjk$$.MODULE$$.tokenize($c);")
  override protected def withNewChildInternal(newChild: Expression): FtsTokenizeCjk =
    copy(child = newChild)
}

object FtsTokenizeCjk {
  /** CJK codepoint test: unified ideographs + radicals (2E80–9FFF covers
    * kana at 3040–30FF too), hangul syllables, compatibility ideographs,
    * extension planes. */
  def isCjk(cp: Int): Boolean =
    (cp >= 0x2E80 && cp <= 0x9FFF) ||
      (cp >= 0xAC00 && cp <= 0xD7AF) ||
      (cp >= 0xF900 && cp <= 0xFAFF) ||
      (cp >= 0x20000 && cp <= 0x2FA1F)

  /** String-level kernel (shared with the query-side mirror
    * [[graft.fts.AnalyzerConfig.tokenizeQuery]]). */
  def tokenizeString(s: String): Seq[String] = {
    val lower = s.toLowerCase(Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val word = new java.lang.StringBuilder()
    val cjkRun = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flushWord(): Unit =
      if (word.length > 0) { out += word.toString; word.setLength(0) }
    def flushCjk(): Unit = {
      if (cjkRun.length == 1) out += new String(Character.toChars(cjkRun(0)))
      else (0 until cjkRun.length - 1).foreach { i =>
        out += new String(
          Character.toChars(cjkRun(i)) ++ Character.toChars(cjkRun(i + 1)))
      }
      cjkRun.clear()
    }
    var i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      if (isCjk(cp)) { flushWord(); cjkRun += cp }
      else if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) {
        flushCjk(); word.appendCodePoint(cp)
      } else { flushWord(); flushCjk() }
      i += Character.charCount(cp)
    }
    flushWord(); flushCjk()
    out.toSeq
  }

  def tokenize(s: UTF8String): ArrayData =
    new GenericArrayData(
      tokenizeString(s.toString).map(UTF8String.fromString).toArray[Any])
}

/** Scan-path kernel for `fts_prefix`: true iff ANY token of the document
  * starts with `prefix` (already normalized through the token grammar by
  * [[RewriteFtsMatch]], which is the only producer — not SQL-registered).
  * Codegen'd like [[FtsTokenize]]; the index path replaces this with a
  * term-RANGE postings semi-join ([[graft.fts.Search.matchPrefixIds]]). */
case class FtsHasTokenPrefix(child: Expression, prefix: String)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fts_prefix requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "fts_has_token_prefix"
  override def nullSafeEval(input: Any): Any =
    FtsHasTokenPrefix.eval(input.asInstanceOf[UTF8String],
      UTF8String.fromString(prefix))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("prefix", UTF8String.fromString(prefix))
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.FtsHasTokenPrefix$$.MODULE$$.eval($c, $p);")
  }
  override protected def withNewChildInternal(newChild: Expression): FtsHasTokenPrefix =
    copy(child = newChild)
}

object FtsHasTokenPrefix {
  def eval(s: UTF8String, prefix: UTF8String): Boolean = {
    val toks = FtsTokenize.tokenize(s)
    var i = 0
    while (i < toks.numElements()) {
      if (toks.getUTF8String(i).startsWith(prefix)) return true
      i += 1
    }
    false
  }
}

/** Scan-path kernel for `fts_term_range`: true iff ANY token of the
  * document sorts inside [lo, hi] (bounds inclusive/exclusive per flag;
  * binary UTF8 order — identical to the order the postings are sorted in,
  * so scan and index paths agree). Produced only by [[RewriteFtsMatch]];
  * not SQL-registered. The index path replaces this with a pushed term
  * RANGE over the sorted postings
  * ([[graft.fts.Search.matchTermRangeIds]], row-group min/max pruning —
  * the same access path as `fts_prefix`). */
case class FtsHasTokenRange(child: Expression, lo: String, hi: String,
                            inclLo: Boolean, inclHi: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fts_term_range requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "fts_has_token_range"
  override def nullSafeEval(input: Any): Any =
    FtsHasTokenRange.eval(input.asInstanceOf[UTF8String],
      UTF8String.fromString(lo), UTF8String.fromString(hi), inclLo, inclHi)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("lo", UTF8String.fromString(lo))
    val h = ctx.addReferenceObj("hi", UTF8String.fromString(hi))
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.FtsHasTokenRange$$.MODULE$$.eval($c, $l, $h, " +
        s"$inclLo, $inclHi);")
  }
  override protected def withNewChildInternal(newChild: Expression): FtsHasTokenRange =
    copy(child = newChild)
}

object FtsHasTokenRange {
  def eval(s: UTF8String, lo: UTF8String, hi: UTF8String,
           inclLo: Boolean, inclHi: Boolean): Boolean = {
    val toks = FtsTokenize.tokenize(s)
    var i = 0
    while (i < toks.numElements()) {
      val t = toks.getUTF8String(i)
      val cl = t.compareTo(lo)
      val ch = t.compareTo(hi)
      if ((if (inclLo) cl >= 0 else cl > 0) &&
          (if (inclHi) ch <= 0 else ch < 0)) return true
      i += 1
    }
    false
  }
}

/** Scan-path kernel for `fts_wildcard`: true iff ANY token starts with
  * `head`, ends with `tail`, and is long enough that head and tail do not
  * overlap (the exact semantics of the single-star pattern `head*tail`).
  * Produced only by [[RewriteFtsMatch]]; not SQL-registered. */
case class FtsHasTokenWildcard(child: Expression, head: String, tail: String)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fts_wildcard requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "fts_has_token_wildcard"
  override def nullSafeEval(input: Any): Any =
    FtsHasTokenWildcard.eval(input.asInstanceOf[UTF8String],
      UTF8String.fromString(head), UTF8String.fromString(tail))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("wcHead", UTF8String.fromString(head))
    val t = ctx.addReferenceObj("wcTail", UTF8String.fromString(tail))
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.FtsHasTokenWildcard$$.MODULE$$.eval($c, $h, $t);")
  }
  override protected def withNewChildInternal(newChild: Expression): FtsHasTokenWildcard =
    copy(child = newChild)
}

object FtsHasTokenWildcard {
  def eval(s: UTF8String, head: UTF8String, tail: UTF8String): Boolean = {
    val toks = FtsTokenize.tokenize(s)
    val need = head.numChars() + tail.numChars()
    var i = 0
    while (i < toks.numElements()) {
      val t = toks.getUTF8String(i)
      if (t.numChars() >= need && t.startsWith(head) && t.endsWith(tail))
        return true
      i += 1
    }
    false
  }
}

/** Scan-path kernel for `fts_near`: true iff tokens `a` and `b` occur within
  * `slop` positions of each other (either order). Single pass over the token
  * stream tracking the most recent occurrence of each term — any qualifying
  * pair (i, j), j < i, is caught at i because the latest other-term position
  * is ≥ j. `a == b` degenerates to containment, matching
  * [[graft.fts.Search.matchNear]]'s position-list semantics (|p − q| ≤ slop
  * is satisfied by p = q). Produced only by [[RewriteFtsMatch]]. */
case class FtsNearTokens(child: Expression, a: String, b: String, slop: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fts_near requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "fts_near_tokens"
  override def nullSafeEval(input: Any): Any =
    FtsNearTokens.eval(input.asInstanceOf[UTF8String],
      UTF8String.fromString(a), UTF8String.fromString(b), slop)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("nearA", UTF8String.fromString(a))
    val rb = ctx.addReferenceObj("nearB", UTF8String.fromString(b))
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.FtsNearTokens$$.MODULE$$.eval($c, $ra, $rb, $slop);")
  }
  override protected def withNewChildInternal(newChild: Expression): FtsNearTokens =
    copy(child = newChild)
}

object FtsNearTokens {
  def eval(s: UTF8String, a: UTF8String, b: UTF8String, slop: Int): Boolean = {
    val toks = FtsTokenize.tokenize(s)
    val n = toks.numElements()
    if (a.equals(b)) { // |p − q| ≤ slop holds at p = q: containment
      var i = 0
      while (i < n) {
        if (toks.getUTF8String(i).equals(a)) return true
        i += 1
      }
      return false
    }
    var lastA = -1
    var lastB = -1
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t.equals(a)) {
        if (lastB >= 0 && i - lastB <= slop) return true
        lastA = i
      } else if (t.equals(b)) {
        if (lastA >= 0 && i - lastA <= slop) return true
        lastB = i
      }
      i += 1
    }
    false
  }
}

/** Scan-path kernel for `fts_phrase_slop`: true iff the phrase terms occur
  * IN ORDER with total span ≤ terms−1+slop (at most `slop` extra tokens
  * interleaved; slop 0 = exact phrase). Single pass over the token stream
  * with an n-slot DP: `best(j)` holds the LATEST start position of any
  * in-order chain covering slots 0..j seen so far — the span-minimal chain
  * a later slot-(j+1) match can extend. Slots are scanned descending per
  * position so a chain never consumes two slots at one token (matters when
  * the phrase repeats a term). Mirrors
  * [[graft.fts.Search.matchPhraseSloppy]]'s position-list semantics; the
  * index path replaces this with the pure postings plan. Produced only by
  * [[RewriteFtsMatch]]; not SQL-registered. */
case class FtsPhraseSlopTokens(child: Expression, terms: Seq[String], slop: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fts_phrase_slop requires STRING input, got ${child.dataType.catalogString}")
  override def prettyName: String = "fts_phrase_slop_tokens"
  @transient private lazy val termArr: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray
  override def nullSafeEval(input: Any): Any =
    FtsPhraseSlopTokens.eval(input.asInstanceOf[UTF8String], termArr, slop)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("slopTerms", termArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ext.FtsPhraseSlopTokens$$.MODULE$$.eval($c, $arr, $slop);")
  }
  override protected def withNewChildInternal(newChild: Expression): FtsPhraseSlopTokens =
    copy(child = newChild)
}

object FtsPhraseSlopTokens {
  def eval(s: UTF8String, terms: Array[UTF8String], slop: Int): Boolean = {
    val toks = FtsTokenize.tokenize(s)
    val n = terms.length
    if (n == 0) return false
    val m = toks.numElements()
    val window = n - 1 + slop
    // best(j) = latest start of an in-order chain over slots 0..j ending
    // strictly before the current position; −1 = no chain yet
    val best = new Array[Int](n)
    java.util.Arrays.fill(best, -1)
    var p = 0
    while (p < m) {
      val t = toks.getUTF8String(p)
      var j = n - 1
      while (j >= 0) {
        if (t.equals(terms(j))) {
          if (j == 0) {
            if (n == 1) return true
            best(0) = p // later start always dominates
          } else {
            val start = best(j - 1)
            if (start >= 0) {
              if (j == n - 1) {
                if (p - start <= window) return true
                // window missed: a later completion against a later start
                // may still fit — keep scanning
              } else if (start > best(j)) best(j) = start
            }
          }
        }
        j -= 1
      }
      p += 1
    }
    false
  }
}

/** `fts_snippet(text, 'q terms', width)`: the token window of ±`width`
  * tokens around the FIRST occurrence of any query term, space-joined —
  * the result-page snippet every search surface renders next to a hit.
  * NULL when no term occurs. Directly evaluable (plain per-row kernel, no
  * corpus state), codegen'd, deterministic: first occurrence in token
  * order, query terms normalized through the frozen grammar. */
case class FtsSnippet(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == org.apache.spark.sql.types.IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "fts_snippet requires (STRING, STRING, INT), got " +
          Seq(first, second, third).map(_.dataType.catalogString).mkString(", "))
  override def prettyName: String = "fts_snippet"
  override def nullSafeEval(s: Any, q: Any, w: Any): Any =
    FtsSnippet.eval(s.asInstanceOf[UTF8String], q.asInstanceOf[UTF8String],
      w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, q, w) => {
      val res = ctx.freshName("snip")
      s"""Object $res = graft.ext.FtsSnippet$$.MODULE$$.eval($s, $q, $w);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $res; }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FtsSnippet =
    copy(first = f, second = s, third = t)
}

object FtsSnippet {
  /** Null when no query term occurs (distinguishes "no match" from an
    * empty document). */
  def eval(s: UTF8String, q: UTF8String, width: Int): UTF8String = {
    val toks = FtsTokenize.tokenize(s)
    val terms = FtsTokenize.tokenize(q)
    val n = toks.numElements()
    val m = terms.numElements()
    var hit = -1
    var i = 0
    while (i < n && hit < 0) {
      var j = 0
      while (j < m && hit < 0) {
        if (toks.getUTF8String(i).equals(terms.getUTF8String(j))) hit = i
        j += 1
      }
      i += 1
    }
    if (hit < 0) null
    else {
      val w = math.max(0, width)
      val from = math.max(0, hit - w)
      val to = math.min(n - 1, hit + w)
      val sb = new java.lang.StringBuilder()
      var k = from
      while (k <= to) {
        if (k > from) sb.append(' ')
        sb.append(toks.getUTF8String(k).toString)
        k += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** `fts_match(text, 'q terms')`: true iff the document contains ALL query
  * terms (token-level AND). Left unevaluated at runtime on purpose: the
  * analyzer accepts it, and [[RewriteFtsMatch]] lowers it to plain
  * array_contains conjunctions over [[FtsTokenize]] during optimization —
  * the same "rewrite the predicate, let the engine optimize the rest"
  * pattern as the reference's LikeSimplification (Optimizer.scala:99) and
  * RewritePredicateSubquery (Optimizer.scala:123). */
case class FtsMatch(left: Expression, right: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_match"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsMatch =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `fts_match_any(text, 'q terms')`: true iff the document contains AT
  * LEAST ONE query term (token-level OR). Lowered by [[RewriteFtsMatch]]
  * exactly like [[FtsMatch]] — index path is a semi-join against the ANY
  * postings (no per-doc term-count filter), scan path an OR conjunction. */
case class FtsMatchAny(left: Expression, right: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_match_any"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsMatchAny =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `fts_match_min(text, 'q terms', k)`: true iff the document contains at
  * least k DISTINCT query terms — Lucene's
  * BooleanQuery.setMinimumNumberShouldMatch / Elasticsearch's
  * minimum_should_match. Lowered by [[RewriteFtsMatch]]: index path =
  * pruned-postings distinct-term count ≥ k
  * ([[graft.fts.Search.matchMinIds]] — index-exact, covering for id-only
  * projections); scan path = size(array_intersect(tokens, terms)) ≥ k
  * (array_intersect dedups, so the count is distinct-terms on both
  * paths). k above the analyzed term count matches nothing (the analyzer
  * may drop stopwords — a data condition); k < 1 fails loud. */
case class FtsMatchMin(first: Expression, second: Expression,
                       third: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_match_min"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsMatchMin =
    copy(first = newChildren(0), second = newChildren(1), third = newChildren(2))
}

/** `fts_phrase(text, 'exact phrase')`: true iff the document contains the
  * phrase as a contiguous token sequence (the SQL surface of
  * [[graft.fts.Search.matchPhrase]]). Lowered by [[RewriteFtsMatch]]:
  * scan path = token-canonical substring containment; index path =
  * all-terms postings semi-join (cheap candidates) + the same containment
  * as a residual filter. */
case class FtsPhrase(left: Expression, right: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_phrase"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsPhrase =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `fts_phrase_wild(text, 'data quer*')`: true iff the document contains a
  * contiguous token sequence where each space-separated SLOT matches — an
  * exact term, or a `*`/`?` wildcard pattern (Lucene's MultiPhraseQuery,
  * query syntax `"data quer*"`). Lowered by [[RewriteFtsMatch]]: index
  * path = position-list adjacency fold with per-slot pattern unions over
  * a POSITIONAL v1 index ([[graft.fts.Search.matchPhraseWildPositional]]);
  * scan path = per-start-offset slot checks over the token array (exact
  * slots compare, pattern slots run the codegen'd LIKE). */
case class FtsPhraseWild(left: Expression, right: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_phrase_wild"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsPhraseWild =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `fts_score(text, 'q terms')`: the document's BM25(k1=1.2, b=0.75) score
  * for the query — RANKED retrieval on the SQL surface, so
  * `SELECT doc_id, fts_score(text,'q') AS s FROM docs
  *  WHERE fts_match_any(text,'q') ORDER BY s DESC LIMIT 10`
  * plans as a partition-pruned postings scoring join + TakeOrderedAndProject
  * (the reference's top-k primitive, sql/core/.../execution/limit.scala:114).
  * Unevaluable: corpus statistics (df, avgdl, N) live in the persisted
  * index, so [[RewriteFtsMatch]] lowers it — for a table registered in
  * [[graft.fts.IndexCatalog]] — to a left-outer join against
  * [[graft.fts.Search.scoreAllBm25]] over the pruned postings (docs with no
  * query term score 0.0). There is no scan fallback: without an index the
  * statistics don't exist, and the rewrite fails loud instead of silently
  * scanning the corpus four times. */
case class FtsScore(left: Expression, right: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = false // coalesced to 0.0 by the rewrite
  override def prettyName: String = "fts_score"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsScore =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `fts_prefix(text, 'quer')`: true iff the document contains a token with
  * the given prefix — the wildcard-suffix query `quer*`. Lowered by
  * [[RewriteFtsMatch]]: index path = a term-RANGE semi-join against the
  * term-sorted postings ([[graft.fts.Search.matchPrefixIds]]; row-group
  * min/max pruning); scan path = the [[FtsHasTokenPrefix]] kernel. */
case class FtsPrefix(left: Expression, right: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_prefix"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsPrefix =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `fts_term_range(text, 'lo', 'hi', incl_lo, incl_hi)`: true iff the
  * document contains a token inside the [lo, hi] dictionary range —
  * Lucene's range query (query syntax `[lo TO hi]` / `{lo TO hi}`).
  * Lowered by [[RewriteFtsMatch]]: index path =
  * [[graft.fts.Search.matchTermRangeIds]] (the bounds push as a term
  * range into the term-sorted postings, parquet row-group min/max pruning
  * — the same access path as `fts_prefix`, whose `prefix ≤ t < prefix⁺`
  * window is the special case); scan path = the [[FtsHasTokenRange]]
  * kernel. */
case class FtsTermRange(text: Expression, lo: Expression, hi: Expression,
                        inclLo: Expression, inclHi: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(text, lo, hi, inclLo, inclHi)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_term_range"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsTermRange =
    copy(text = newChildren(0), lo = newChildren(1), hi = newChildren(2),
      inclLo = newChildren(3), inclHi = newChildren(4))
}

/** `fts_near(text, 'a', 'b', slop)`: true iff tokens a and b occur within
  * `slop` positions of each other, either order — proximity search on the
  * SQL surface. Lowered by [[RewriteFtsMatch]]: over a POSITIONAL index
  * ([[graft.fts.Index.buildPositional]]) it is a pure postings plan
  * ([[graft.fts.Search.matchNear]], text never re-read); over a
  * non-positional index, an all-terms candidate semi-join with the
  * [[FtsNearTokens]] kernel as residual; unindexed, the kernel alone. */
case class FtsNear(text: Expression, termA: Expression, termB: Expression,
                   slop: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(text, termA, termB, slop)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_near"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsNear =
    copy(text = newChildren(0), termA = newChildren(1), termB = newChildren(2),
      slop = newChildren(3))
}

/** `fts_phrase_slop(text, 'a b', k)`: true iff the phrase terms occur in
  * order with at most `k` extra tokens interleaved (span ≤ terms−1+k) —
  * Lucene's sloppy phrase `"a b"~k`, restricted to ORDERED matches (the
  * unordered pairwise form is `fts_near`). `k = 0` is the exact phrase.
  * Lowered by [[RewriteFtsMatch]]: over a POSITIONAL index a pure postings
  * plan ([[graft.fts.Search.matchPhraseSloppy]], text never re-read); over
  * a tf-only v1 index an all-terms candidate semi-join with the
  * [[FtsPhraseSlopTokens]] kernel as residual; unindexed, the kernel
  * alone. */
case class FtsPhraseSlop(text: Expression, phrase: Expression,
                         slop: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(text, phrase, slop)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_phrase_slop"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsPhraseSlop =
    copy(text = newChildren(0), phrase = newChildren(1), slop = newChildren(2))
}

/** `fts_wildcard(text, 'qu*ry')`: true iff the document contains a token
  * matching the wildcard pattern — any number of `*` (any run) plus `?`
  * (exactly one char), Lucene's full WildcardQuery. Lowered by
  * [[RewriteFtsMatch]]: the single-star no-`?` form takes the LIKE-free
  * head-range + suffix-residual semi-join ([[graft.fts.Search.matchWildcardIds]],
  * reversed-layout suffix path for a leading star) with the
  * [[FtsHasTokenWildcard]] kernel as scan path; GENERAL patterns push the
  * literal head as a term range and run a codegen'd LIKE over the pruned
  * postings ([[graft.fts.Search.matchPatternIds]]), scan path an
  * exists(tokens, LIKE). `fts_prefix` is the tail-less special case with
  * its own simpler lowering. */
case class FtsWildcard(left: Expression, right: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_wildcard"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsWildcard =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `fts_fuzzy(text, 'term', k)`: true iff the document contains a token
  * within `k` Levenshtein edits of the term — typo-tolerant search on the
  * SQL surface (query syntax `term~k`). Lowered by [[RewriteFtsMatch]]:
  * index path = [[graft.fts.Search.matchFuzzyIds]] (the distance runs over
  * the length-banded term DICTIONARY, never the corpus; matched terms
  * drive the ordinary postings-union semi-join); scan path = a banded
  * `levenshtein(t, term, k) >= 0` exists() over the token array (the
  * threshold form bails out of the DP early, so a long token costs
  * O(len·k), not O(len²)). */
case class FtsFuzzy(text: Expression, term: Expression, maxEdits: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(text, term, maxEdits)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_fuzzy"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsFuzzy =
    copy(text = newChildren(0), term = newChildren(1), maxEdits = newChildren(2))
}

/** `fts_regexp(text, 'pattern')`: true iff the document contains a token
  * the regex matches IN FULL — Lucene's RegexpQuery (implicitly anchored
  * at both ends), query syntax `/pattern/`. Index terms are the frozen v1
  * grammar's lowercase `[a-z0-9]+`, so the pattern is matched against
  * that dictionary; an uppercase literal can never match. Lowered by
  * [[RewriteFtsMatch]] (reference seed: RLike,
  * sql/catalyst/.../regexpExpressions.scala:125): a pattern with an
  * anchored LITERAL prefix pushes the prefix as a term RANGE into the
  * sorted postings (row-group min/max pruning — the wildcard
  * [[graft.fts.Search.matchPatternIds]] plan with RLIKE as the residual
  * instead of LIKE); a prefix-free pattern runs the codegen'd RLIKE over
  * the postings' term column (dictionary-sized, never the corpus) and the
  * matched rows drive the ordinary id-set semi-join. Scan path: an
  * exists(tokens, RLIKE) over the token array. Keep patterns RE2-portable
  * (no lookaround/backrefs) — the oracle engine replays them. */
case class FtsRegexp(text: Expression, pattern: Expression)
    extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(text, pattern)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_regexp"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FtsRegexp =
    copy(text = newChildren(0), pattern = newChildren(1))
}

/** Lowers [[FtsMatch]] along one of two paths:
  *
  *  1. **Index-backed** (the 100 TB path): a `fts_match` conjunct in a
  *     `Filter` directly over a table registered in
  *     [[graft.fts.IndexCatalog]] becomes a LEFT-SEMI join against the
  *     persisted bucketed postings ([[graft.fts.Index.lookup]]), so the
  *     postings scan partition-prunes to the query terms' hash buckets —
  *     ~|terms| buckets read instead of the whole corpus. Same
  *     predicate→semi-join shape as the reference's
  *     RewritePredicateSubquery (Optimizer.scala:123); the pruning rides
  *     the stock partition-pruning pathway (FileSourceStrategy.scala:78).
  *  2. **Scan fallback**: any remaining `fts_match` is rewritten to
  *     `array_contains(fts_tokenize(text), term) AND …` — a full scan, but
  *     codegen'd and pushdown-friendly like any predicate.
  */
object RewriteFtsMatch extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{Alias, And, ArrayContains, Attribute, Coalesce, EqualTo, ExprId, IsNotNull, Literal, NamedExpression}
  import org.apache.spark.sql.catalyst.plans.{LeftOuter, LeftSemi}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, Project, SubqueryAlias}
  import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
  import graft.fts.IndexCatalog

  private def queryTerms(q: UTF8String): Seq[String] =
    graft.fts.Analyzer.tokenizeString(q.toString).distinct

  /** Query terms normalized through the INDEX's analyzer pipeline — an
    * analyzer-configured index (stemmed/stopworded/CJK) is only answerable
    * by terms that went through the same stages the corpus did
    * (AnalyzerConfig is persisted with the index for exactly this replay;
    * for the default config this is [[queryTerms]]). */
  private def entryTerms(entry: IndexCatalog.Entry, q: UTF8String): Seq[String] =
    if (entry.analyzer.isV1) queryTerms(q)
    else entry.analyzer.tokenizeQuery(q.toString).distinct

  /** Phrase tokens keep ORDER and REPETITION (unlike [[queryTerms]]). */
  private def phraseTerms(q: UTF8String): Seq[String] =
    graft.fts.Analyzer.tokenizeString(q.toString)

  /** Phrase tokens through the entry's analyzer pipeline — order and
    * repetition preserved (tokenizeQuery keeps both; only [[entryTerms]]
    * dedups). A positional ANALYZER index stores positions in analyzed
    * space ([[graft.fts.Index.buildPositionalWithAnalyzer]]), so the
    * phrase's analyzed token sequence is exactly what adjacency means
    * there — stemmed phrase search. */
  private def entryPhraseTerms(entry: IndexCatalog.Entry,
                               q: UTF8String): Seq[String] =
    if (entry.analyzer.isV1) phraseTerms(q)
    else entry.analyzer.tokenizeQuery(q.toString)

  /** A near operand through the entry's pipeline: None when the analyzer
    * drops it (stopword / min-length) or splits it (CJK bigrams of a
    * multi-char operand) — a dropped term has no postings, so the
    * proximity predicate can never hold. */
  private def entryNearTerm(entry: IndexCatalog.Entry,
                            t: String): Option[String] =
    if (entry.analyzer.isV1) Some(t)
    else entry.analyzer.tokenizeQuery(t) match {
      case Seq(one) => Some(one)
      case _ => None
    }

  /** Token-canonical phrase containment over `text`: the space-padded join
    * of the tokens contains the space-padded phrase — all codegen'd
    * built-ins, identical semantics to [[graft.fts.Search.matchPhrase]]'s
    * verification stage. */
  private def phraseContains(text: Expression, terms: Seq[String]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{ArrayJoin, Concat, Contains}
    def s(v: String) = Literal(UTF8String.fromString(v), StringType)
    val canonical = Concat(Seq(s(" "),
      ArrayJoin(FtsTokenize(text), s(" "), None), s(" ")))
    Contains(canonical, s(" " + terms.mkString(" ") + " "))
  }

  // rewritable-conjunct modes
  private val ModeAll = 0
  private val ModeAny = 1
  private val ModePhrase = 2

  /** An attribute's resolved index binding: the entry serving it plus the
    * child-level id attribute to semi-join on. A table can carry SEVERAL
    * indexes (one per text column), so every conjunct resolves its OWN
    * binding from the attribute it scores/filters. */
  private type EntryFor = Attribute => Option[(IndexCatalog.Entry, Attribute)]

  /** A Filter conjunct the index path can lower, bound to the entry that
    * answers it (and the id attribute its id set joins on). */
  private sealed trait FtsConjunct
  private final case class TermsConj(entry: IndexCatalog.Entry,
                                     idAttr: Attribute, attr: Attribute,
                                     q: UTF8String, mode: Int)
      extends FtsConjunct
  /** `NOT fts_match(_any)` — lowered as a LEFT-ANTI join on the same id
    * sets the positive forms semi-join (the library's mustNot semantics,
    * [[graft.fts.Search.matchBoolean]]). `requireAll` mirrors the inner
    * predicate: NOT match = anti on the all-terms ids, NOT match_any =
    * anti on the any-term ids. `attr` (the text column) rides along for the
    * IsNotNull conjunct: a NULL-text doc has no postings, so the bare
    * anti-join would KEEP it while the scan path's NOT(NULL) = NULL drops
    * it — three-valued semantics must not depend on index registration. */
  private final case class NotTermsConj(entry: IndexCatalog.Entry,
                                        idAttr: Attribute, attr: Attribute,
                                        q: UTF8String, requireAll: Boolean)
      extends FtsConjunct
  /** A DISJUNCTION whose every branch is exactly answerable from the index
    * — lowered as one semi-join against the UNION of the branches' id
    * sets (branches may target DIFFERENT indexed columns of the table, as
    * long as they share the id attribute the union joins on). Branches
    * needing a text residual (phrase/near over a tf-only index)
    * disqualify the whole disjunction (the residual would have to apply
    * per-branch, which a union of ids cannot express) and it falls back
    * to the scan lowering instead. */
  private final case class OrConj(idAttr: Attribute,
                                  ids: Seq[org.apache.spark.sql.DataFrame])
      extends FtsConjunct

  /** The exact doc-id set for one positive fts predicate over its resolved
    * entry's persisted index — with the id attribute the set joins on — or
    * None when the predicate is not index-exact here. */
  private def exactIdsDf(e: Expression, entryFor: EntryFor)
      : Option[(org.apache.spark.sql.DataFrame, Attribute)] = {
    // type-correct empty id frame (optimizes to an empty LocalRelation)
    def emptyIds(entry: IndexCatalog.Entry) = persistedIx(entry).postings
      .filter(org.apache.spark.sql.GraftColumnBridge.column(Literal.FalseLiteral))
      .select("doc_id")
    e match {
      case FtsMatch(a: Attribute, Literal(q: UTF8String, StringType))
          if entryFor(a).isDefined =>
        val (entry, idAttr) = entryFor(a).get
        val ts = entryTerms(entry, q)
        Some((if (ts.isEmpty) emptyIds(entry)
          else matchingIdsDf(entry, ts, requireAll = true), idAttr))
      case FtsMatchAny(a: Attribute, Literal(q: UTF8String, StringType))
          if entryFor(a).isDefined =>
        val (entry, idAttr) = entryFor(a).get
        val ts = entryTerms(entry, q)
        Some((if (ts.isEmpty) emptyIds(entry)
          else matchingIdsDf(entry, ts, requireAll = false), idAttr))
      case FtsMatchMin(a: Attribute, Literal(q: UTF8String, StringType),
                       Literal(k: Int, org.apache.spark.sql.types.IntegerType))
          if entryFor(a).isDefined =>
        val (entry, idAttr) = entryFor(a).get
        if (k < 1) throw new IllegalArgumentException(
          s"fts_match_min: minimum_should_match must be >= 1, got $k")
        val ts = entryTerms(entry, q)
        Some((if (ts.isEmpty || k > ts.distinct.size) emptyIds(entry)
          else graft.fts.Search.matchMinIds(graft.fts.FtsIndex(
            graft.fts.Index.lookup(persistedIx(entry), ts.distinct,
              entry.buckets), null, null), ts, k), idAttr))
      // phrase/near are index-exact on any POSITIONAL index: v1 positions
      // under the frozen grammar, analyzer positions in analyzed space
      // (query tokens replay the same pipeline). prefix/wildcard keep
      // frozen-v1 semantics: their term SHAPES predate the analyzer
      // stages, so they are only index-exact against a v1 index
      case FtsPhrase(a: Attribute, Literal(q: UTF8String, StringType))
          if entryFor(a).exists(_._1.positional) =>
        val (entry, idAttr) = entryFor(a).get
        val ts = entryPhraseTerms(entry, q)
        Some((if (ts.isEmpty) emptyIds(entry)
          else graft.fts.Search.matchPhrasePositional(
            persistedIx(entry), ts, entry.buckets), idAttr))
      case FtsPhraseWild(a: Attribute, Literal(q: UTF8String, StringType))
          if entryFor(a).exists(e => e._1.analyzer.isV1 && e._1.positional) =>
        val (entry, idAttr) = entryFor(a).get
        val slots = wildSlots(q)
        Some((if (slots.isEmpty) emptyIds(entry)
          else graft.fts.Search.matchPhraseWildPositional(
            persistedIx(entry), slots, entry.buckets), idAttr))
      case FtsNear(a: Attribute, Literal(ta: UTF8String, StringType),
                   Literal(tb: UTF8String, StringType),
                   Literal(sl: Int, org.apache.spark.sql.types.IntegerType))
          if entryFor(a).exists(_._1.positional) =>
        val (entry, idAttr) = entryFor(a).get
        val (na, nb) = (entryNearTerm(entry, singleTerm(ta, "fts_near")),
          entryNearTerm(entry, singleTerm(tb, "fts_near")))
        Some((if (na.isEmpty || nb.isEmpty) emptyIds(entry)
          else graft.fts.Search.matchNear(persistedIx(entry),
            na.get, nb.get, sl, entry.buckets), idAttr))
      case FtsPhraseSlop(a: Attribute, Literal(q: UTF8String, StringType),
                         Literal(sl: Int, org.apache.spark.sql.types.IntegerType))
          if sl >= 0 && entryFor(a).exists(_._1.positional) =>
        val (entry, idAttr) = entryFor(a).get
        val ts = entryPhraseTerms(entry, q)
        Some((if (ts.isEmpty) emptyIds(entry)
          else graft.fts.Search.matchPhraseSloppy(
            persistedIx(entry), ts, sl, entry.buckets), idAttr))
      case FtsPrefix(a: Attribute, Literal(p: UTF8String, StringType))
          if entryFor(a).exists(_._1.analyzer.isV1) =>
        val (entry, idAttr) = entryFor(a).get
        Some((graft.fts.Search.matchPrefixIds(persistedIx(entry), normPrefix(p)),
          idAttr))
      case FtsTermRange(a: Attribute, Literal(lo: UTF8String, StringType),
                        Literal(hi: UTF8String, StringType),
                        Literal(il: Boolean, BooleanType),
                        Literal(ih: Boolean, BooleanType))
          if entryFor(a).exists(_._1.analyzer.isV1) =>
        val (entry, idAttr) = entryFor(a).get
        Some((graft.fts.Search.matchTermRangeIds(persistedIx(entry),
          lo.toString, hi.toString, il, ih), idAttr))
      case FtsWildcard(a: Attribute, Literal(p: UTF8String, StringType))
          if entryFor(a).exists(_._1.analyzer.isV1) =>
        val (entry, idAttr) = entryFor(a).get
        if (isSimpleWildcard(p)) {
          val (h, t) = parseWildcard(p)
          Some((wildcardIdsDf(entry, h, t), idAttr))
        } else
          Some((patternIdsDf(entry, normPattern(p)), idAttr))
      case FtsFuzzy(a: Attribute, Literal(t: UTF8String, StringType),
                    Literal(k: Int, org.apache.spark.sql.types.IntegerType))
          // v1 only: an analyzer index's dictionary is stemmed, so edit
          // distance against the raw query term measures the wrong space
          if entryFor(a).exists(_._1.analyzer.isV1) =>
        val (entry, idAttr) = entryFor(a).get
        Some((graft.fts.Search.matchFuzzyIds(persistedIx(entry),
          singleTerm(t, "fts_fuzzy"), k), idAttr))
      case FtsRegexp(a: Attribute, Literal(p: UTF8String, StringType))
          // v1 only, like wildcard/fuzzy: the pattern measures the v1
          // term space, not an analyzer's stemmed dictionary
          if entryFor(a).exists(_._1.analyzer.isV1) =>
        val (entry, idAttr) = entryFor(a).get
        Some((graft.fts.Search.matchRegexpIds(persistedIx(entry),
          p.toString), idAttr))
      // a disjunction whose every branch is index-exact on the SAME id is
      // itself index-exact: the union of the branch id sets (recursive, so
      // nested Ors flatten; mirrors the filter pass's OrConj)
      case or: org.apache.spark.sql.catalyst.expressions.Or =>
        val branches = splitDisjunctivePredicates(or)
          .map(b => exactIdsDf(b, entryFor))
        if (branches.forall(_.isDefined)) {
          val resolved = branches.flatten
          resolved.map(_._2.exprId).distinct match {
            case Seq(_) =>
              Some((resolved.map(_._1).reduce(_ unionByName _).distinct(),
                resolved.head._2))
            case _ => None
          }
        } else None
      // a conjunction inside an OR branch — `(a AND b*) OR c` — is
      // index-exact when every conjunct is: the INTERSECTION of the id
      // sets (semi-join chain). Top-level Ands never reach here (they are
      // split into separate conjuncts first), so this case exists purely
      // to close the boolean algebra under Or recursion.
      case and: org.apache.spark.sql.catalyst.expressions.And =>
        val branches = splitConjunctivePredicates(and)
          .map(b => exactIdsDf(b, entryFor))
        if (branches.forall(_.isDefined)) {
          val resolved = branches.flatten
          resolved.map(_._2.exprId).distinct match {
            case Seq(_) =>
              Some((resolved.map(_._1).reduce((a, b) =>
                a.join(b, a(a.columns.head) === b(b.columns.head), "left_semi")),
                resolved.head._2))
            case _ => None
          }
        } else None
      case _ => None
    }
  }
  private final case class PrefixConj(entry: IndexCatalog.Entry,
                                      idAttr: Attribute, prefix: String)
      extends FtsConjunct
  private final case class RangeConj(entry: IndexCatalog.Entry,
                                     idAttr: Attribute, lo: String,
                                     hi: String, inclLo: Boolean,
                                     inclHi: Boolean)
      extends FtsConjunct
  private final case class WildcardConj(entry: IndexCatalog.Entry,
                                        idAttr: Attribute, head: String,
                                        tail: String)
      extends FtsConjunct
  private final case class FuzzyConj(entry: IndexCatalog.Entry,
                                     idAttr: Attribute, term: String,
                                     maxEdits: Int)
      extends FtsConjunct
  /** GENERAL wildcard (multi-star / '?') — a pushed literal-head range +
    * per-term LIKE over the pruned postings; the single-star form keeps
    * its LIKE-free [[WildcardConj]] plan. */
  private final case class PatternConj(entry: IndexCatalog.Entry,
                                       idAttr: Attribute, pattern: String)
      extends FtsConjunct
  /** `fts_regexp` / the query language's `/pattern/` — anchored-literal-
    * prefix term range + full-match RLIKE residual over the pruned
    * postings ([[graft.fts.Search.matchRegexpIds]]). */
  private final case class RegexpConj(entry: IndexCatalog.Entry,
                                      idAttr: Attribute, pattern: String)
      extends FtsConjunct
  /** `fts_match_min` — minimum-should-match boolean: ≥ k of the query's
    * terms present. Postings-only (per-doc distinct-term count over the
    * terms' pruned postings), so it composes with other index conjuncts
    * in the semi-join fold instead of forcing a corpus scan. */
  private final case class MinConj(entry: IndexCatalog.Entry,
                                   idAttr: Attribute, q: UTF8String, k: Int)
      extends FtsConjunct
  /** `fts_phrase_wild` — wildcard-slot phrase; index-exact only against a
    * POSITIONAL v1 index (patterns measure the v1 term space, and the
    * adjacency fold needs position lists). */
  private final case class WildPhraseConj(entry: IndexCatalog.Entry,
                                          idAttr: Attribute,
                                          slots: Seq[String])
      extends FtsConjunct
  private final case class NearConj(entry: IndexCatalog.Entry,
                                    idAttr: Attribute, attr: Attribute,
                                    a: String, b: String, slop: Int)
      extends FtsConjunct
  /** `fts_phrase_slop` — ordered sloppy phrase. Positional entry: pure
    * postings plan; tf-only v1 entry: all-terms candidates + the ordered
    * window kernel as residual over candidates only. */
  private final case class SlopConj(entry: IndexCatalog.Entry,
                                    idAttr: Attribute, attr: Attribute,
                                    q: UTF8String, slop: Int)
      extends FtsConjunct

  /** Validated (head, tail) of a single-star wildcard pattern. */
  private def parseWildcard(p: UTF8String): (String, String) = {
    val norm = p.toString.toLowerCase(Locale.ROOT)
    if (norm.count(_ == '*') != 1)
      throw new IllegalArgumentException(
        s"fts_wildcard requires exactly one '*', got '$p'")
    val Array(head, tail) = norm.split("\\*", -1)
    if ((head + tail).isEmpty || !(head + tail).matches("[a-z0-9]*"))
      throw new IllegalArgumentException(
        s"fts_wildcard parts must normalize to [a-z0-9], got '$p'")
    (head, tail)
  }

  /** True when the pattern is the single-star `head*tail` form with no
    * `?` — the shape the range+suffix plan ([[graft.fts.Search.matchWildcardIds]],
    * reversed-layout suffix path) answers without a per-term LIKE. */
  private def isSimpleWildcard(p: UTF8String): Boolean = {
    val n = p.toString.toLowerCase(Locale.ROOT)
    n.count(_ == '*') == 1 && !n.contains('?') &&
      n.replace("*", "").nonEmpty && n.replace("*", "").matches("[a-z0-9]+")
  }

  /** Lowercased GENERAL wildcard pattern (any number of `*`, plus `?`
    * single-char wildcards — Lucene's full WildcardQuery surface);
    * validated against the only charset the frozen grammar can index. */
  private def normPattern(p: UTF8String): String = {
    val n = p.toString.toLowerCase(Locale.ROOT)
    if (!n.matches("[a-z0-9*?]+"))
      throw new IllegalArgumentException(
        s"fts_wildcard pattern must normalize to [a-z0-9*?]+, got '$p'")
    if (n.forall(_ == '*'))
      throw new IllegalArgumentException(
        s"fts_wildcard all-star pattern '$p' matches every token — use a term range")
    n
  }

  /** Normalized wildcard-phrase slots: the space-separated words of the
    * slot string, each an exact term or a `*`/`?` pattern with at least
    * one literal character (a meta-only slot would cost a dictionary-wide
    * union per phrase position — rejected loud, like the all-star
    * wildcard). */
  private def wildSlots(q: UTF8String): Seq[String] = {
    val slots = q.toString.toLowerCase(Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toSeq
    slots.foreach { s =>
      if (!s.matches("[a-z0-9*?]+"))
        throw new IllegalArgumentException(
          s"fts_phrase_wild slot '$s' must normalize to [a-z0-9*?]+ " +
            "(the only charset the frozen grammar indexes)")
      if (s.forall(c => c == '*' || c == '?'))
        throw new IllegalArgumentException(
          s"fts_phrase_wild slot '$s' needs at least one literal character " +
            "— a metacharacter-only slot matches the whole dictionary")
    }
    slots
  }

  /** Wildcard-phrase SCAN path: some start offset i where tokens(i+j)
    * satisfies slot j for every j — exact slots compare, pattern slots run
    * the codegen'd LIKE. Guarded CaseWhen keeps 3VL (NULL text → NULL) and
    * never evaluates the sequence with a sub-1 stop (Sequence would
    * auto-descend into index 0). The repeated FtsTokenize collapses under
    * subexpression elimination. */
  private def wildPhraseExists(text: Expression, slots: Seq[String]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.IntegerType
    val n = slots.size
    def s(v: String) = Literal(UTF8String.fromString(v), StringType)
    val toks = FtsTokenize(text)
    val iv = NamedLambdaVariable("i", IntegerType, nullable = false)
    val checks = slots.zipWithIndex.map[Expression] { case (slot, j) =>
      val elem = ElementAt(toks,
        if (j == 0) iv else Add(iv, Literal(j)))
      if (slot.exists(c => c == '*' || c == '?'))
        new Like(elem, s(slot.replace('*', '%').replace('?', '_')))
      else EqualTo(elem, s(slot))
    }.reduce(And(_, _))
    // Sequence is TimeZoneAwareExpression even over ints — it stays
    // unresolved (and trips PLAN_VALIDATION) until a zone is bound
    val starts = new Sequence(
      Literal(1), Subtract(Size(toks), Literal(n - 1)), None,
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    CaseWhen(
      Seq(
        (IsNull(text), Literal(null, BooleanType)),
        (GreaterThanOrEqual(Size(toks), Literal(n)),
          ArrayExists(starts, LambdaFunction(checks, Seq(iv))))),
      Some(Literal.FalseLiteral))
  }

  /** General-pattern SCAN path: exists(tokens, t → t LIKE pattern) with
    * `*`→`%`, `?`→`_` (terms are [a-z0-9]+ — nothing to escape). The Like
    * is the codegen'd built-in; no regex engine. */
  private def tokenPatternExists(text: Expression, norm: String): Expression = {
    val v = org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable(
      "t", StringType, nullable = false)
    org.apache.spark.sql.catalyst.expressions.ArrayExists(
      FtsTokenize(text),
      org.apache.spark.sql.catalyst.expressions.LambdaFunction(
        new org.apache.spark.sql.catalyst.expressions.Like(v,
          Literal(UTF8String.fromString(
            norm.replace('*', '%').replace('?', '_')), StringType)),
        Seq(v)))
  }

  /** Lowercased prefix; must normalize to a [a-z0-9]+ token fragment (the
    * only shape the frozen grammar can index). */
  private def normPrefix(p: UTF8String): String = {
    val norm = p.toString.toLowerCase(Locale.ROOT)
    if (norm.isEmpty || !norm.matches("[a-z0-9]+"))
      throw new IllegalArgumentException(
        s"fts_prefix requires a prefix that normalizes to [a-z0-9]+, got '$p'")
    norm
  }

  /** The single token `t` normalizes to under the frozen grammar. */
  private def singleTerm(t: UTF8String, fn: String): String = {
    val ts = queryTerms(t)
    if (ts.size != 1)
      throw new IllegalArgumentException(
        s"$fn requires terms that normalize to exactly one token, got '$t'")
    ts.head
  }

  /** The persisted index as a lookup-ready handle, cached per (session,
    * indexDir) in [[IndexCatalog.cachedIndex]] — re-opening the parquet on
    * every optimizer pass cost a file LISTING per query even when the TTL
    * fingerprint check passed. */
  private def persistedIx(entry: IndexCatalog.Entry): graft.fts.FtsIndex =
    IndexCatalog.cachedIndex(
      org.apache.spark.sql.SparkSession.active, entry)

  /** The base-relation exprId that `attr` (an output of `plan`) carries,
    * traced through pass-through Projects (direct references and simple
    * `col AS alias` renames), Filters, and SubqueryAliases. None for
    * computed expressions or any node this walk doesn't model — name
    * equality alone is NOT identity: `SELECT upper(title) AS text` must not
    * be lowered to the text column's postings semi-join. */
  private def traceToBase(attr: Attribute, plan: LogicalPlan): Option[ExprId] =
    plan match {
      case lr: LogicalRelation =>
        lr.output.find(_.exprId == attr.exprId).map(_.exprId)
      case p: Project =>
        p.projectList.find(_.exprId == attr.exprId).flatMap {
          case a: Attribute => traceToBase(a, p.child)
          case Alias(a: Attribute, _) => traceToBase(a, p.child)
          case _ => None
        }
      case f: Filter => traceToBase(attr, f.child)
      case s: SubqueryAlias => traceToBase(attr, s.child)
      case _ => None
    }

  /** Thread `needed` base attributes through the pass-through chain
    * [[traceToBase]] models, so a column ColumnPruning dropped (doc_id
    * under an Aggregate that only needs lang+text) is available again as a
    * join key. Only ADDS columns to pass-through Projects — callers that
    * use the returned plan must restore the original schema on top. */
  private def ensureCols(plan: LogicalPlan, needed: Seq[Attribute]): LogicalPlan =
    plan match {
      case p: Project =>
        val c = ensureCols(p.child, needed)
        val missing = needed.filterNot(n =>
          p.projectList.exists(_.exprId == n.exprId))
          .filter(c.outputSet.contains)
        Project(p.projectList ++ missing, c)
      case f: Filter => Filter(f.condition, ensureCols(f.child, needed))
      case s: SubqueryAlias => SubqueryAlias(s.identifier, ensureCols(s.child, needed))
      case other => other // a relation exposes everything already
    }

  /** ALL registered FRESH indexes for a plan rooted at exactly one
    * file-source relation, as a resolver from an attribute to its serving
    * entry + the id attribute (semi-join key) — by exprId lineage, never
    * by name. One table may carry several indexes (one per text column:
    * title + body), so resolution is per attribute. Returns the resolver
    * plus the EFFECTIVE child to graft joins onto: identical to `child`
    * unless the id column had been pruned below it, in which case it is
    * re-threaded through the pass-through chain (callers restore the
    * original schema on top — all of them already wrap in a Project or an
    * Aggregate whose output is the declared one). */
  private def indexedTable(child: LogicalPlan): Option[(EntryFor, LogicalPlan)] =
    child.collectLeaves() match {
      case Seq(lr: LogicalRelation) =>
        val entries = (lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.headOption
          case _ => None
        }).toSeq.flatMap(path => IndexCatalog.entriesFor(path.toString))
        val baseIds = entries
          .flatMap(e => lr.output.find(_.name.equalsIgnoreCase(e.idCol)))
          .distinct
        val effChild =
          if (baseIds.forall(b => child.output.exists(a =>
              traceToBase(a, child).contains(b.exprId)))) child
          else ensureCols(child, baseIds)
        val resolved: Map[ExprId, (IndexCatalog.Entry, Attribute)] =
          entries.flatMap { entry =>
            for {
              baseText <- lr.output.find(_.name.equalsIgnoreCase(entry.textCol))
              baseIdCol <- lr.output.find(_.name.equalsIgnoreCase(entry.idCol))
              idAttr <- effChild.output.find(a =>
                traceToBase(a, effChild).contains(baseIdCol.exprId))
            } yield baseText.exprId -> (entry, idAttr)
          }.toMap
        if (resolved.isEmpty) None
        else Some(((a: Attribute) => traceToBase(a, effChild).flatMap(resolved.get),
          effChild))
      case _ => None
    }

  /** Doc ids matching `terms` (ALL of them, or ANY if `requireAll` is
    * false), as an optimized logical plan over the persisted postings
    * (optimized eagerly so partition pruning + pushdown have already run by
    * the time it is grafted into the outer tree — the later optimizer
    * batches of the outer query won't revisit it). */
  private def matchingIdsDf(entry: IndexCatalog.Entry, terms: Seq[String],
                            requireAll: Boolean): org.apache.spark.sql.DataFrame = {
    // bucket-pruned postings slice, then the same AND/OR match shapes the
    // library API exposes — one implementation of the match semantics
    val pruned = graft.fts.FtsIndex(
      graft.fts.Index.lookup(persistedIx(entry), terms, entry.buckets),
      null, null)
    if (requireAll) graft.fts.Search.matchAllIds(pruned, terms)
    else graft.fts.Search.matchAnyIds(pruned, terms)
  }

  private def matchingIds(entry: IndexCatalog.Entry, terms: Seq[String],
                          requireAll: Boolean): LogicalPlan =
    matchingIdsDf(entry, terms, requireAll).queryExecution.optimizedPlan

  /** Wildcard id set: a LEADING star over an index persisted WITH the
    * reversed-term projection answers as a prefix range over the reversed
    * dictionary ([[graft.fts.Search.matchSuffixIds]] — row-group pruning)
    * instead of a term-dictionary scan; every other shape takes the
    * head-range + suffix-residual path. */
  private def wildcardIdsDf(entry: IndexCatalog.Entry, head: String,
                            tail: String): org.apache.spark.sql.DataFrame =
    if (head.isEmpty && entry.reversed)
      graft.fts.Search.matchSuffixIds(
        graft.fts.Index.readReversed(
          org.apache.spark.sql.SparkSession.active, entry.indexDir), tail)
    else graft.fts.Search.matchWildcardIds(persistedIx(entry), s"$head*$tail")

  /** General-pattern id set, handing [[graft.fts.Search.matchPatternIds]]
    * the reversed-term projection when the index persisted one, so
    * head-less patterns with a literal TAIL (`*ing`, `*a?d`) push as a
    * prefix range over the reversed dictionary instead of scanning the
    * full term column. */
  private def patternIdsDf(entry: IndexCatalog.Entry,
                           pat: String): org.apache.spark.sql.DataFrame =
    graft.fts.Search.matchPatternIds(persistedIx(entry), pat,
      if (entry.reversed)
        Some(graft.fts.Index.readReversed(
          org.apache.spark.sql.SparkSession.active, entry.indexDir))
      else None)

  /** Per-doc BM25 scores for `terms` as an optimized logical plan over the
    * persisted index — postings pruned to the terms' buckets, doc lengths
    * and corpus stats joined in ([[graft.fts.Search.scoreAllBm25]]).
    * Output: (doc_id, score). */
  private def scoringPlan(entry: IndexCatalog.Entry, terms: Seq[String]): LogicalPlan = {
    val ix = persistedIx(entry)
    val pruned = ix.copy(postings = graft.fts.Index.lookup(ix, terms, entry.buckets))
    graft.fts.Search.scoreAllBm25(pruned, terms).queryExecution.optimizedPlan
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    var rewrote = false
    // Pass 0 — ranked retrieval: fts_score occurrences in a Project over a
    // registered table become a LEFT-OUTER join against the per-doc BM25
    // scoring subplan (pruned postings ⋈ doclens ⋈ stats), the expression
    // replaced by coalesce(score, 0.0) — docs containing no query term
    // score zero. Runs BEFORE the filter pass so the Project's child is
    // still the clean Filter/SubqueryAlias/relation chain traceToBase
    // models (the filter pass grafts joins into that chain).
    // Graft the scoring join(s) under `child` and substitute each lowerable
    // FtsScore in `exprs` with coalesce(score, 0.0). None if nothing lowers.
    def lowerScores(exprs: Seq[Expression], child: LogicalPlan)
        : Option[(Seq[Expression], LogicalPlan)] =
      indexedTable(child).flatMap { case (entryFor, effChild) =>
        // one scoring join per (index, query) — two scored COLUMNS of the
        // same table resolve to different entries and get their own joins
        val queries = exprs.flatMap(_.collect {
          case FtsScore(a: Attribute, Literal(q: UTF8String, StringType))
              if entryFor(a).isDefined =>
            val (entry, idAttr) = entryFor(a).get
            ((entry.indexDir, q), (entry, idAttr))
        }).distinct
        if (queries.isEmpty) None
        else {
          var cur: LogicalPlan = effChild
          val repl = scala.collection.mutable.Map.empty[(String, UTF8String), Expression]
          queries.foreach { case ((dirKey, q), (entry, idAttr)) =>
            val terms = entryTerms(entry, q)
            if (terms.isEmpty) repl((dirKey, q)) = Literal(0.0)
            else {
              val sub = scoringPlan(entry, terms)
              cur = Join(cur, sub, LeftOuter,
                Some(EqualTo(idAttr, sub.output.head)), JoinHint.NONE)
              repl((dirKey, q)) = Coalesce(Seq(sub.output(1), Literal(0.0)))
            }
          }
          val newExprs = exprs.map(_.transform {
            case FtsScore(a: Attribute, Literal(q: UTF8String, StringType))
                if entryFor(a).isDefined =>
              repl((entryFor(a).get._1.indexDir, q))
          })
          Some((newExprs, cur))
        }
      }
    // INDEX-ONLY (covering) ranked retrieval: when the projection touches
    // nothing but the id column and fts_score, and every WHERE conjunct is
    // index-exact — with at least one conjunct BOUNDING the rows to the
    // score's term domain — the corpus scan is unnecessary: the answer is
    // the scoring subplan semi-joined with the conjuncts' id sets. At
    // 100 TB this is the difference between a per-query corpus-wide
    // doc_id scan and a plan that touches only the query terms' pruned
    // postings buckets (the covering-index property).
    // The covered CORE for a set of expressions over Filter(cond, …): the
    // scoring subplan semi-joined with the conjuncts' id sets, plus the
    // attributes to rewrite with. None unless: every FtsScore in `exprs`
    // resolves to ONE (index, query); every non-score reference in `exprs`
    // is the id column; every conjunct is index-exact on the same id (or
    // an IsNotNull implied by index-domain membership); and ≥1 conjunct
    // BOUNDS the rows to the score's term domain.
    def coveredCore(exprs: Seq[Expression], cond: Expression,
                    grandchild: LogicalPlan)
        : Option[(LogicalPlan, Attribute, Attribute, ExprId)] =
      indexedTable(grandchild).flatMap { case (entryFor, _) =>
        val allScores = exprs.flatMap(_.collect { case fs: FtsScore => fs })
        val resolved = allScores.flatMap {
          case FtsScore(a: Attribute, Literal(q: UTF8String, StringType)) =>
            entryFor(a).map { case (e, id) => (e, id, q) }
          case _ => Seq.empty
        }
        // every score occurrence must resolve, to ONE (index, query)
        if (allScores.isEmpty || resolved.size != allScores.size ||
            resolved.map(r => (r._1.indexDir, r._3)).distinct.size != 1)
          None
        else {
          val (entry, idAttr, q) = resolved.head
          val scoreTerms = entryTerms(entry, q)
          // the expressions may reference nothing beyond the id column
          // (everything else would need the corpus row)
          val refsOk = scoreTerms.nonEmpty && exprs.forall { e =>
            e.transform { case _: FtsScore => Literal(0.0) }
              .references.subsetOf(
                org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(idAttr)))
          }
          // classify conjuncts: each is an exact id set on the same id
          // attribute, an ignorable IsNotNull (implied by index-domain
          // membership), or disqualifying
          var bounding = false
          var ok = refsOk
          val idSets = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
          val antiIdSets = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
          splitConjunctivePredicates(cond).foreach {
            case IsNotNull(a: Attribute)
                if a.exprId == idAttr.exprId ||
                  entryFor(a).exists(_._1.indexDir == entry.indexDir) =>
              () // postings rows have non-null ids and indexed text
            // a NEGATED index-exact conjunct subtracts its id set (anti-
            // join) — sound in the covered domain because every row comes
            // from postings of non-null indexed text, matching the scan
            // path's 3VL (NOT fts_match(NULL,…) is NULL there → dropped)
            case org.apache.spark.sql.catalyst.expressions.Not(inner) =>
              exactIdsDf(inner, entryFor) match {
                case Some((df, conjId)) if conjId.exprId == idAttr.exprId =>
                  antiIdSets += df.queryExecution.optimizedPlan
                case _ => ok = false
              }
            case conj =>
              exactIdsDf(conj, entryFor) match {
                case Some((df, conjId)) if conjId.exprId == idAttr.exprId =>
                  idSets += df.queryExecution.optimizedPlan
                  // does this conjunct imply membership in the score's
                  // term domain (≥1 score term present)?
                  conj match {
                    case FtsMatch(a: Attribute, Literal(q2: UTF8String, StringType))
                        if entryFor(a).exists(_._1.indexDir == entry.indexDir) &&
                          entryTerms(entry, q2).exists(scoreTerms.contains) =>
                      bounding = true
                    case FtsMatchAny(a: Attribute, Literal(q2: UTF8String, StringType))
                        if entryFor(a).exists(_._1.indexDir == entry.indexDir) && {
                          val ts = entryTerms(entry, q2)
                          ts.nonEmpty && ts.forall(scoreTerms.contains)
                        } => bounding = true
                    case _ => ()
                  }
                case _ => ok = false
              }
          }
          if (!ok || !bounding) None
          else {
            var cur: LogicalPlan = scoringPlan(entry, scoreTerms)
            val scoreIdAttr = cur.output.head
            val scoreAttr = cur.output(1)
            idSets.foreach { ids =>
              cur = Join(cur, ids, LeftSemi,
                Some(EqualTo(scoreIdAttr, ids.output.head)), JoinHint.NONE)
            }
            antiIdSets.foreach { ids =>
              cur = Join(cur, ids,
                org.apache.spark.sql.catalyst.plans.LeftAnti,
                Some(EqualTo(scoreIdAttr, ids.output.head)), JoinHint.NONE)
            }
            Some((cur, scoreIdAttr, scoreAttr, idAttr.exprId))
          }
        }
      }
    // rewrite one expression against the covered core's attributes; a bare
    // id reference keeps its exprId for consumers above (alias trick)
    def coveredExpr(e: Expression, scoreIdAttr: Attribute,
                    scoreAttr: Attribute, idExprId: ExprId): Expression =
      e.transform {
        case _: FtsScore => Coalesce(Seq(scoreAttr, Literal(0.0)))
        case a: Attribute if a.exprId == idExprId => scoreIdAttr
      }
    // rewrite a projection list against the covered core, keeping output
    // exprIds stable for consumers above
    def coveredList(list: Seq[NamedExpression], scoreIdAttr: Attribute,
                    scoreAttr: Attribute, idExprId: ExprId): Seq[NamedExpression] =
      list.map { ne =>
        coveredExpr(ne, scoreIdAttr, scoreAttr, idExprId) match {
          case a: Attribute if a.exprId != ne.exprId =>
            Alias(a, ne.name)(exprId = ne.exprId)
          case other => other.asInstanceOf[NamedExpression]
        }
      }
    def indexOnly(projectList: Seq[NamedExpression], child: LogicalPlan)
        : Option[LogicalPlan] = child match {
      case Filter(cond, grandchild) =>
        coveredCore(projectList, cond, grandchild).map {
          case (core, scoreIdAttr, scoreAttr, idExprId) =>
            Project(coveredList(projectList, scoreIdAttr, scoreAttr, idExprId),
              core)
        }
      case _ => None
    }
    // PURE-MATCH covering: `SELECT id-only … WHERE <all index-exact
    // conjuncts>` needs no corpus row either — the answer IS the
    // conjuncts' id sets, semi-joined together. Same uniqueness contract
    // as every covered plan: the id column identifies a document (the
    // index aggregates per id; tombstone/upsert semantics already assume
    // it).
    def coveredMatch(projectList: Seq[NamedExpression], cond: Expression,
                     grandchild: LogicalPlan): Option[LogicalPlan] =
      indexedTable(grandchild).flatMap { case (entryFor, _) =>
        val conjs = splitConjunctivePredicates(cond)
        val exact = conjs.flatMap(c => exactIdsDf(c, entryFor).map(c -> _))
        val exactConjs = exact.map(_._1).toSet
        // NEGATED index-exact conjuncts subtract their id set via an
        // anti-join (the covered domain is postings rows — non-null
        // indexed text — so this matches the scan path's 3VL where
        // NOT fts_match(NULL,…) is NULL → dropped). At least one POSITIVE
        // set must remain to define the domain.
        val anti = conjs.filterNot(exactConjs.contains).flatMap {
          case n @ org.apache.spark.sql.catalyst.expressions.Not(inner) =>
            exactIdsDf(inner, entryFor).map(n -> _)
          case _ => Nil
        }
        val antiConjs = anti.map(_._1: Expression).toSet
        val idAttrs = (exact ++ anti).map(_._2._2.exprId).distinct
        if (exact.isEmpty || idAttrs.size != 1) None
        else {
          val idAttr = exact.head._2._2
          // attrs positively matched — an IsNotNull over one of them (or
          // the id) is implied by index-domain membership
          val positiveAttrs = exact.map(_._1).flatMap(_.collect {
            case a: Attribute => a.exprId
          }).toSet + idAttr.exprId
          val leftovers = conjs.filterNot(exactConjs.contains)
            .filterNot(antiConjs.contains).forall {
            case IsNotNull(a: Attribute) => positiveAttrs.contains(a.exprId)
            case _ => false
          }
          val projOk = projectList.forall(_.references.subsetOf(
            org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(idAttr))))
          if (!leftovers || !projOk) None
          else {
            var core = exact.head._2._1.queryExecution.optimizedPlan
            exact.tail.foreach { case (_, (df, _)) =>
              val p = df.queryExecution.optimizedPlan
              core = Join(core, p, LeftSemi,
                Some(EqualTo(core.output.head, p.output.head)), JoinHint.NONE)
            }
            anti.foreach { case (_, (df, _)) =>
              val p = df.queryExecution.optimizedPlan
              core = Join(core, p,
                org.apache.spark.sql.catalyst.plans.LeftAnti,
                Some(EqualTo(core.output.head, p.output.head)), JoinHint.NONE)
            }
            val coreId = core.output.head
            val newList = projectList.map { ne =>
              val t = ne.transform {
                case a: Attribute if a.exprId == idAttr.exprId => coreId
              }
              t match {
                case a: Attribute if a.exprId != ne.exprId =>
                  Alias(a, ne.name)(exprId = ne.exprId)
                case other => other.asInstanceOf[NamedExpression]
              }
            }
            Some(Project(newList, core))
          }
        }
      }
    // `SELECT id-only … WHERE <index-exact> ORDER BY fts_score(…) LIMIT k`
    // plans as Project(id, Sort(score-order, Project([id, text], Filter)))
    // — the inner Project carries text ONLY to feed the sort key, so the
    // id-only-ness is visible at the OUTER Project. A pre-pass covers the
    // whole chain (the inner list is discarded; the outer one is the real
    // output): Project(ids, Sort(rewritten keys, core)) — with LIMIT this
    // still pattern-matches TakeOrderedAndProject, and the corpus is never
    // scanned.
    val sortCovered = plan.transformUp {
      case p @ Project(projectList, Filter(cond, grandchild))
          if p.resolved &&
            cond.exists(e => e.isInstanceOf[FtsMatch] ||
              e.isInstanceOf[FtsMatchAny] || e.isInstanceOf[FtsMatchMin] ||
              e.isInstanceOf[FtsPhrase] ||
              e.isInstanceOf[FtsPrefix] || e.isInstanceOf[FtsWildcard] ||
              e.isInstanceOf[FtsTermRange] || e.isInstanceOf[FtsNear] ||
              e.isInstanceOf[FtsPhraseSlop] ||
              e.isInstanceOf[FtsPhraseWild]) &&
            !projectList.exists(_.exists(_.isInstanceOf[FtsScore])) =>
        coveredMatch(projectList, cond, grandchild) match {
          case Some(covered) =>
            rewrote = true
            covered
          case None => p
        }
      case p @ Project(outerList,
            org.apache.spark.sql.catalyst.plans.logical.Sort(
              order, global, Project(_, Filter(cond, grandchild)), hint))
          if p.resolved && order.exists(_.exists(_.isInstanceOf[FtsScore])) &&
            !outerList.exists(_.exists(_.isInstanceOf[FtsScore])) =>
        coveredCore(order ++ outerList, cond, grandchild) match {
          case Some((core, scoreIdAttr, scoreAttr, idExprId)) =>
            rewrote = true
            val newOrder = order.map(o =>
              coveredExpr(o, scoreIdAttr, scoreAttr, idExprId)
                .asInstanceOf[org.apache.spark.sql.catalyst.expressions.SortOrder])
            Project(coveredList(outerList, scoreIdAttr, scoreAttr, idExprId),
              org.apache.spark.sql.catalyst.plans.logical.Sort(
                newOrder, global, core, hint))
          case None => p
        }
    }
    val scoreAware = sortCovered.transformUp {
      case p @ Project(projectList, child)
          if p.resolved && projectList.exists(_.exists(_.isInstanceOf[FtsScore])) =>
        indexOnly(projectList, child) match {
          case Some(covered) =>
            rewrote = true
            covered
          case None => lowerScores(projectList, child) match {
            case Some((newList, cur)) =>
              rewrote = true
              Project(newList.map(_.asInstanceOf[NamedExpression]), cur)
            case None => p
          }
        }
      // filter pushdown may have INLINED a projected score alias into a
      // Filter condition (`WHERE s <> 0` over `SELECT fts_score(..) AS s`) —
      // lower it there too, projecting back to the child's schema so the
      // grafted join's columns don't leak upward
      case f @ Filter(cond, child)
          if f.resolved && cond.exists(_.isInstanceOf[FtsScore]) =>
        lowerScores(Seq(cond), child) match {
          case Some((Seq(newCond), cur)) =>
            rewrote = true
            Project(child.output, Filter(newCond, cur))
          case _ => f
        }
      // `ORDER BY fts_score(text,'q') DESC` without projecting the score:
      // graft the scoring join below the Sort, rewrite the sort keys, and
      // project the original schema back on top — with LIMIT the whole
      // thing still plans as TakeOrderedAndProject
      case srt @ org.apache.spark.sql.catalyst.plans.logical.Sort(
            order, global, child, hint)
          if srt.resolved && order.exists(_.exists(_.isInstanceOf[FtsScore])) =>
        lowerScores(order, child) match {
          case Some((newOrder, cur)) =>
            rewrote = true
            Project(child.output,
              org.apache.spark.sql.catalyst.plans.logical.Sort(
                newOrder.map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.SortOrder]),
                global, cur, hint))
          case None => srt
        }
      // AGGREGATE positions — `GROUP BY lang … max(fts_score(text,'q'))`
      // or a HAVING over one (parsed as an agg expression): graft the
      // scoring join below the Aggregate and rewrite both grouping and
      // aggregate expressions; the Aggregate's declared output is
      // unchanged, so the join's columns don't leak upward
      case agg @ org.apache.spark.sql.catalyst.plans.logical.Aggregate(
            grouping, aggExprs, child, hint)
          if agg.resolved &&
            (grouping ++ aggExprs).exists(_.exists(_.isInstanceOf[FtsScore])) =>
        lowerScores(grouping ++ aggExprs, child) match {
          case Some((newAll, cur)) =>
            rewrote = true
            val (newG, newA) = newAll.splitAt(grouping.size)
            org.apache.spark.sql.catalyst.plans.logical.Aggregate(
              newG, newA.map(_.asInstanceOf[NamedExpression]), cur, hint)
          case None => agg
        }
    }
    val indexAware = scoreAware.transformUp {
      case f @ Filter(cond, child) if f.resolved =>
        indexedTable(child) match {
          case Some((entryFor, effChild)) =>
            // classified rewritable fts conjuncts, each bound to the entry
            // resolved from ITS OWN attribute — one WHERE clause may probe
            // several indexed columns (title AND body) of the same table
            val (fts, rest) = splitConjunctivePredicates(cond).partitionMap {
              case FtsMatch(a: Attribute, Literal(q: UTF8String, StringType))
                  if entryFor(a).isDefined =>
                val (e, id) = entryFor(a).get
                Left(TermsConj(e, id, a, q, ModeAll))
              case FtsMatchAny(a: Attribute, Literal(q: UTF8String, StringType))
                  if entryFor(a).isDefined =>
                val (e, id) = entryFor(a).get
                Left(TermsConj(e, id, a, q, ModeAny))
              case FtsPhrase(a: Attribute, Literal(q: UTF8String, StringType))
                  // v1: positional exact or containment residual; analyzer:
                  // only a positional index can answer (the residual's v1
                  // re-tokenize of text does not speak analyzed positions)
                  if entryFor(a).exists(e => e._1.analyzer.isV1 || e._1.positional) =>
                val (e, id) = entryFor(a).get
                Left(TermsConj(e, id, a, q, ModePhrase))
              case org.apache.spark.sql.catalyst.expressions.Not(
                  FtsMatch(a: Attribute, Literal(q: UTF8String, StringType)))
                  if entryFor(a).isDefined =>
                val (e, id) = entryFor(a).get
                Left(NotTermsConj(e, id, a, q, requireAll = true))
              case org.apache.spark.sql.catalyst.expressions.Not(
                  FtsMatchAny(a: Attribute, Literal(q: UTF8String, StringType)))
                  if entryFor(a).isDefined =>
                val (e, id) = entryFor(a).get
                Left(NotTermsConj(e, id, a, q, requireAll = false))
              case FtsPrefix(a: Attribute, Literal(p: UTF8String, StringType))
                  if entryFor(a).exists(_._1.analyzer.isV1) =>
                val (e, id) = entryFor(a).get
                Left(PrefixConj(e, id, normPrefix(p)))
              case FtsTermRange(a: Attribute,
                                Literal(lo: UTF8String, StringType),
                                Literal(hi: UTF8String, StringType),
                                Literal(il: Boolean, BooleanType),
                                Literal(ih: Boolean, BooleanType))
                  if entryFor(a).exists(_._1.analyzer.isV1) =>
                val (e, id) = entryFor(a).get
                Left(RangeConj(e, id, lo.toString, hi.toString, il, ih))
              case FtsWildcard(a: Attribute, Literal(p: UTF8String, StringType))
                  if entryFor(a).exists(_._1.analyzer.isV1) =>
                val (e, id) = entryFor(a).get
                if (isSimpleWildcard(p)) {
                  val (h, t) = parseWildcard(p)
                  Left(WildcardConj(e, id, h, t))
                } else Left(PatternConj(e, id, normPattern(p)))
              case FtsFuzzy(a: Attribute, Literal(t: UTF8String, StringType),
                            Literal(k: Int, org.apache.spark.sql.types.IntegerType))
                  if entryFor(a).exists(_._1.analyzer.isV1) =>
                val (e, id) = entryFor(a).get
                Left(FuzzyConj(e, id, singleTerm(t, "fts_fuzzy"), k))
              case FtsRegexp(a: Attribute, Literal(p: UTF8String, StringType))
                  if entryFor(a).exists(_._1.analyzer.isV1) =>
                val (e, id) = entryFor(a).get
                Left(RegexpConj(e, id, p.toString))
              case FtsMatchMin(a: Attribute, Literal(q: UTF8String, StringType),
                               Literal(k: Int, org.apache.spark.sql.types.IntegerType))
                  if entryFor(a).isDefined =>
                if (k < 1) throw new IllegalArgumentException(
                  s"fts_match_min: minimum_should_match must be >= 1, got $k")
                val (e, id) = entryFor(a).get
                Left(MinConj(e, id, q, k))
              case or: org.apache.spark.sql.catalyst.expressions.Or =>
                val branchIds = splitDisjunctivePredicates(or)
                  .map(b => exactIdsDf(b, entryFor))
                if (branchIds.forall(_.isDefined)) {
                  val resolved = branchIds.flatten
                  // one union semi-join has ONE join key: branches over
                  // different indexed columns are fine (same doc id), but
                  // mixed id attributes cannot union
                  resolved.map(_._2.exprId).distinct match {
                    case Seq(_) =>
                      Left(OrConj(resolved.head._2, resolved.map(_._1)))
                    case _ => Right(or)
                  }
                } else Right(or)
              case FtsPhraseWild(a: Attribute, Literal(q: UTF8String, StringType))
                  // positional v1 only: patterns measure the v1 term
                  // space, and the fold needs position lists — no tf-only
                  // residual exists (the scan path handles unindexed runs)
                  if entryFor(a).exists(e => e._1.analyzer.isV1 && e._1.positional) =>
                val (e, id) = entryFor(a).get
                Left(WildPhraseConj(e, id, wildSlots(q)))
              case FtsNear(a: Attribute, Literal(ta: UTF8String, StringType),
                           Literal(tb: UTF8String, StringType),
                           Literal(sl: Int, org.apache.spark.sql.types.IntegerType))
                  if entryFor(a).exists(e => e._1.analyzer.isV1 || e._1.positional) =>
                val (e, id) = entryFor(a).get
                Left(NearConj(e, id, a, singleTerm(ta, "fts_near"),
                  singleTerm(tb, "fts_near"), sl))
              case FtsPhraseSlop(a: Attribute, Literal(q: UTF8String, StringType),
                                 Literal(sl: Int, org.apache.spark.sql.types.IntegerType))
                  // positional: index-exact; tf-only v1: candidates + the
                  // token-kernel residual (an analyzer tf-only index can't
                  // answer — the residual's v1 re-tokenize of text does not
                  // speak analyzed positions)
                  if sl >= 0 &&
                    entryFor(a).exists(e => e._1.analyzer.isV1 || e._1.positional) =>
                val (e, id) = entryFor(a).get
                Left(SlopConj(e, id, a, q, sl))
              case other => Right(other)
            }
            if (fts.isEmpty) f
            else {
              rewrote = true
              val base = rest.reduceOption(And).map(Filter(_, effChild))
                .getOrElse(effChild)
              def semi(cur: LogicalPlan, sub: LogicalPlan,
                       idAttr: Attribute): LogicalPlan =
                Join(cur, sub, LeftSemi,
                  Some(EqualTo(idAttr, sub.output.head)), JoinHint.NONE)
              val folded = fts.foldLeft(base) {
                case (cur, TermsConj(entry, idAttr, a, q, mode)) =>
                  val terms = entryTerms(entry, q)
                  if (terms.isEmpty) Filter(Literal.FalseLiteral, cur)
                  else if (mode == ModePhrase && entry.positional)
                    // a POSITIONAL index answers the phrase exactly from
                    // position lists — no containment residual, text never
                    // re-read (Search.matchPhrasePositional). Analyzer
                    // entries match in analyzed space: entryPhraseTerms
                    // replays the pipeline ordered, and the stored
                    // positions are analyzed-stream offsets
                    semi(cur, graft.fts.Search.matchPhrasePositional(
                      persistedIx(entry), entryPhraseTerms(entry, q),
                      entry.buckets)
                      .queryExecution.optimizedPlan, idAttr)
                  else {
                    val joined = semi(cur,
                      matchingIds(entry, terms, requireAll = mode != ModeAny),
                      idAttr)
                    // phrase over tf-only postings: all-terms candidates +
                    // containment verified as a residual over candidates
                    if (mode == ModePhrase)
                      Filter(phraseContains(a, phraseTerms(q)), joined)
                    else joined
                  }
                case (cur, NotTermsConj(entry, idAttr, a, q, requireAll)) =>
                  val terms = entryTerms(entry, q)
                  // NOT over no usable terms is NOT(false) = true: keep all
                  if (terms.isEmpty) cur
                  else {
                    val sub = matchingIds(entry, terms, requireAll)
                    // IsNotNull mirrors the scan path's three-valued logic:
                    // NOT fts_match(NULL, …) is NULL there, so the doc drops
                    Join(Filter(IsNotNull(a), cur), sub,
                      org.apache.spark.sql.catalyst.plans.LeftAnti,
                      Some(EqualTo(idAttr, sub.output.head)), JoinHint.NONE)
                  }
                case (cur, OrConj(idAttr, ids)) =>
                  // one semi-join against the UNION of the branch id sets
                  semi(cur, ids.reduce(_ unionByName _).distinct()
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, PrefixConj(entry, idAttr, p)) =>
                  // term-RANGE over the sorted postings (row-group min/max
                  // pruning; hash buckets can't help a prefix)
                  semi(cur, graft.fts.Search.matchPrefixIds(persistedIx(entry), p)
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, RangeConj(entry, idAttr, lo, hi, il, ih)) =>
                  // user-bounded term RANGE — the prefix window generalized
                  semi(cur, graft.fts.Search.matchTermRangeIds(
                    persistedIx(entry), lo, hi, il, ih)
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, WildcardConj(entry, idAttr, h, t)) =>
                  semi(cur, wildcardIdsDf(entry, h, t)
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, PatternConj(entry, idAttr, pat)) =>
                  semi(cur, patternIdsDf(entry, pat)
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, RegexpConj(entry, idAttr, pat)) =>
                  // prefix-ranged full-match RLIKE over the pruned
                  // postings — dictionary-sized, the corpus never sees
                  // the regex engine
                  semi(cur, graft.fts.Search.matchRegexpIds(
                    persistedIx(entry), pat)
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, MinConj(entry, idAttr, q, k)) =>
                  // per-doc distinct-term count ≥ k over the terms' pruned
                  // postings (same plan as the single-predicate path)
                  val ts = entryTerms(entry, q)
                  if (ts.isEmpty || k > ts.distinct.size)
                    Filter(Literal.FalseLiteral, cur)
                  else semi(cur, graft.fts.Search.matchMinIds(
                    graft.fts.FtsIndex(graft.fts.Index.lookup(
                      persistedIx(entry), ts.distinct, entry.buckets),
                      null, null), ts, k)
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, WildPhraseConj(entry, idAttr, slots)) =>
                  // position-list adjacency fold with pattern-slot unions
                  // — pure postings plan, text never re-read
                  if (slots.isEmpty) Filter(Literal.FalseLiteral, cur)
                  else semi(cur,
                    graft.fts.Search.matchPhraseWildPositional(
                      persistedIx(entry), slots, entry.buckets)
                      .queryExecution.optimizedPlan, idAttr)
                case (cur, FuzzyConj(entry, idAttr, t, k)) =>
                  // distance over the length-banded term dictionary; the
                  // matched terms drive the ordinary postings union — the
                  // corpus side never sees the distance function
                  semi(cur, graft.fts.Search.matchFuzzyIds(
                    persistedIx(entry), t, k)
                    .queryExecution.optimizedPlan, idAttr)
                case (cur, NearConj(entry, idAttr, a, ta, tb, sl)) =>
                  if (entry.positional) {
                    val (na, nb) = (entryNearTerm(entry, ta),
                      entryNearTerm(entry, tb))
                    // an operand the analyzer drops has no postings: the
                    // proximity can never hold
                    if (na.isEmpty || nb.isEmpty)
                      Filter(Literal.FalseLiteral, cur)
                    else semi(cur, graft.fts.Search.matchNear(
                      persistedIx(entry), na.get, nb.get, sl, entry.buckets)
                      .queryExecution.optimizedPlan, idAttr)
                  } else
                    // tf-only index: both-terms candidates, then the token
                    // proximity kernel as residual over candidates only
                    Filter(FtsNearTokens(a, ta, tb, sl),
                      semi(cur, matchingIds(entry, Seq(ta, tb),
                        requireAll = true), idAttr))
                case (cur, SlopConj(entry, idAttr, a, q, sl)) =>
                  val terms = entryPhraseTerms(entry, q)
                  if (terms.isEmpty) Filter(Literal.FalseLiteral, cur)
                  else if (entry.positional)
                    // positions answer the ordered window exactly — no
                    // residual, text never re-read
                    semi(cur, graft.fts.Search.matchPhraseSloppy(
                      persistedIx(entry), terms, sl, entry.buckets)
                      .queryExecution.optimizedPlan, idAttr)
                  else
                    // tf-only v1 index: all-terms candidates, ordered
                    // window kernel as residual over candidates only
                    Filter(FtsPhraseSlopTokens(a, terms, sl),
                      semi(cur, matchingIds(entry, terms.distinct,
                        requireAll = true), idAttr))
              }
              // an id column re-threaded for the join must not leak upward
              if (effChild eq child) folded else Project(child.output, folded)
            }
          case None => f
        }
    }
    // The semi-join just dropped the only reference to the text column, but
    // stock ColumnPruning already ran (this rule sits in the user batch at
    // the optimizer's tail) — re-apply it so the document scan's ReadSchema
    // shrinks to the projected columns instead of shipping the fat text
    // column through the join.
    val pruned =
      if (rewrote)
        // CollapseProject after the prune: the rewrites insert schema-restoring
        // Projects that stack with the query's own — a Limit(Project(Project(
        // Sort))) would no longer pattern-match TakeOrderedAndProject
        org.apache.spark.sql.catalyst.optimizer.CollapseProject(
          org.apache.spark.sql.catalyst.optimizer.ColumnPruning(indexAware))
      else indexAware
    pruned.transformAllExpressions {
      case FtsMatch(text, Literal(q: UTF8String, StringType)) =>
        val terms = queryTerms(q)
        if (terms.isEmpty) Literal.FalseLiteral
        else terms.map[Expression](t =>
            ArrayContains(FtsTokenize(text), Literal(UTF8String.fromString(t), StringType)))
          .reduce(And)
      case FtsMatchAny(text, Literal(q: UTF8String, StringType)) =>
        val terms = queryTerms(q)
        if (terms.isEmpty) Literal.FalseLiteral
        else terms.map[Expression](t =>
            ArrayContains(FtsTokenize(text), Literal(UTF8String.fromString(t), StringType)))
          .reduce(org.apache.spark.sql.catalyst.expressions.Or(_, _))
      case FtsMatchMin(text, Literal(q: UTF8String, StringType),
                       Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
        if (k < 1) throw new IllegalArgumentException(
          s"fts_match_min: minimum_should_match must be >= 1, got $k")
        val terms = queryTerms(q).distinct
        if (terms.isEmpty || k > terms.size) Literal.FalseLiteral
        else org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          org.apache.spark.sql.catalyst.expressions.Size(
            org.apache.spark.sql.catalyst.expressions.ArrayIntersect(
              FtsTokenize(text),
              org.apache.spark.sql.catalyst.expressions.CreateArray(
                terms.map(t => Literal(UTF8String.fromString(t), StringType))))),
          Literal(k))
      case FtsPhrase(text, Literal(q: UTF8String, StringType)) =>
        val terms = phraseTerms(q)
        if (terms.isEmpty) Literal.FalseLiteral
        else phraseContains(text, terms)
      case FtsPrefix(text, Literal(p: UTF8String, StringType)) =>
        FtsHasTokenPrefix(text, normPrefix(p))
      case FtsTermRange(text, Literal(lo: UTF8String, StringType),
                        Literal(hi: UTF8String, StringType),
                        Literal(il: Boolean, BooleanType),
                        Literal(ih: Boolean, BooleanType)) =>
        // normalize + validate through the same rules as the index path
        // (matchTermRangeIds), so scan and index lowering agree and a
        // degenerate range fails loud instead of silently matching nothing
        def normB(s: String, which: String): String = {
          val n = s.toLowerCase(java.util.Locale.ROOT)
          if (!(n.nonEmpty && n.matches("[a-z0-9]+")))
            throw new IllegalArgumentException(s"fts_term_range $which bound " +
              s"must normalize to a non-empty [a-z0-9]+ token, got '$s'")
          n
        }
        val (l, h) = (normB(lo.toString, "lo"), normB(hi.toString, "hi"))
        if (!(if (il && ih) l <= h else l < h))
          throw new IllegalArgumentException(
            s"fts_term_range [$l TO $h] is empty (lo must sort before hi)")
        FtsHasTokenRange(text, l, h, il, ih)
      case FtsWildcard(text, Literal(p: UTF8String, StringType)) =>
        if (isSimpleWildcard(p)) {
          val (h, t) = parseWildcard(p)
          FtsHasTokenWildcard(text, h, t)
        } else tokenPatternExists(text, normPattern(p))
      case FtsPhraseWild(text, Literal(q: UTF8String, StringType)) =>
        val slots = wildSlots(q)
        if (slots.isEmpty) Literal.FalseLiteral
        else wildPhraseExists(text, slots)
      case FtsNear(text, Literal(ta: UTF8String, StringType),
                   Literal(tb: UTF8String, StringType),
                   Literal(sl: Int, org.apache.spark.sql.types.IntegerType)) =>
        if (sl < 0) throw new IllegalArgumentException(
          s"fts_near requires a non-negative slop, got $sl")
        FtsNearTokens(text, singleTerm(ta, "fts_near"),
          singleTerm(tb, "fts_near"), sl)
      case FtsPhraseSlop(text, Literal(q: UTF8String, StringType),
                         Literal(sl: Int, org.apache.spark.sql.types.IntegerType)) =>
        if (sl < 0) throw new IllegalArgumentException(
          s"fts_phrase_slop requires a non-negative slop, got $sl")
        val terms = phraseTerms(q)
        if (terms.isEmpty) Literal.FalseLiteral
        // slop 0 is the exact phrase — same containment lowering, so the
        // two spellings plan identically
        else if (sl == 0) phraseContains(text, terms)
        else FtsPhraseSlopTokens(text, terms, sl)
      case FtsFuzzy(text, Literal(t: UTF8String, StringType),
                    Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
        // scan fallback: exists(tokens, v -> levenshtein(v, term, k) >= 0)
        // — the THRESHOLD form of the codegen'd built-in returns -1 past k
        // and bails out of the DP band early, so a long token costs
        // O(len·k) not O(len²). Same 3VL as the other kernels: NULL text
        // → NULL (ArrayExists over a NULL array).
        if (k < 1 || k > 2) throw new IllegalArgumentException(
          s"fts_fuzzy requires maxEdits in {1, 2}, got $k")
        val term = singleTerm(t, "fts_fuzzy")
        val v = org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable(
          "t", StringType, nullable = false)
        org.apache.spark.sql.catalyst.expressions.ArrayExists(
          FtsTokenize(text),
          org.apache.spark.sql.catalyst.expressions.LambdaFunction(
            org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
              org.apache.spark.sql.catalyst.expressions.Levenshtein(
                v, Literal(UTF8String.fromString(term), StringType),
                Some(Literal(k))),
              Literal(0)),
            Seq(v)))
      case FtsRegexp(text, Literal(p: UTF8String, StringType)) =>
        // scan fallback: exists(tokens, t -> t RLIKE '^(?:pat)$') — the
        // codegen'd built-in compiles the literal pattern once. Full-term
        // anchoring = Lucene RegexpQuery semantics; same 3VL as the other
        // kernels (NULL text → NULL through ArrayExists).
        val pat = p.toString
        if (pat.isEmpty) throw new IllegalArgumentException(
          "fts_regexp pattern must be non-empty")
        try java.util.regex.Pattern.compile(pat)
        catch { case e: java.util.regex.PatternSyntaxException =>
          throw new IllegalArgumentException(
            s"fts_regexp pattern '$pat' does not compile: ${e.getMessage}")
        }
        val v = org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable(
          "t", StringType, nullable = false)
        org.apache.spark.sql.catalyst.expressions.ArrayExists(
          FtsTokenize(text),
          org.apache.spark.sql.catalyst.expressions.LambdaFunction(
            org.apache.spark.sql.catalyst.expressions.RLike(v,
              Literal(UTF8String.fromString("^(?:" + pat + ")$"), StringType)),
            Seq(v)))
      // NULL query literal: three-valued logic, same as every SQL predicate
      case FtsMatch(_, Literal(null, _)) => Literal(null, BooleanType)
      case FtsMatchAny(_, Literal(null, _)) => Literal(null, BooleanType)
      case FtsMatchMin(_, q, k)
          if Seq(q, k).exists {
            case Literal(null, _) => true; case _ => false } =>
        Literal(null, BooleanType)
      case FtsPhrase(_, Literal(null, _)) => Literal(null, BooleanType)
      case FtsPhraseWild(_, Literal(null, _)) => Literal(null, BooleanType)
      case FtsPrefix(_, Literal(null, _)) => Literal(null, BooleanType)
      case FtsWildcard(_, Literal(null, _)) => Literal(null, BooleanType)
      case FtsRegexp(_, Literal(null, _)) => Literal(null, BooleanType)
      case FtsNear(_, a, b, s)
          if Seq(a, b, s).exists {
            case Literal(null, _) => true; case _ => false } =>
        Literal(null, BooleanType)
      case FtsFuzzy(_, t, k)
          if Seq(t, k).exists {
            case Literal(null, _) => true; case _ => false } =>
        Literal(null, BooleanType)
      case FtsPhraseSlop(_, q, s)
          if Seq(q, s).exists {
            case Literal(null, _) => true; case _ => false } =>
        Literal(null, BooleanType)
      case FtsTermRange(_, lo, hi, il, ih)
          if Seq(lo, hi, il, ih).exists {
            case Literal(null, _) => true; case _ => false } =>
        Literal(null, BooleanType)
      // anything else (non-literal query) would otherwise survive as an
      // Unevaluable and die in physical planning with an opaque error
      case m: FtsMatch => throw new IllegalArgumentException(
        s"fts_match requires a literal query string, got: ${m.right.sql}")
      case m: FtsMatchAny => throw new IllegalArgumentException(
        s"fts_match_any requires a literal query string, got: ${m.right.sql}")
      case m: FtsMatchMin => throw new IllegalArgumentException(
        "fts_match_min requires a literal query string and a literal INT " +
          s"threshold, got: ${m.sql}")
      case m: FtsPhrase => throw new IllegalArgumentException(
        s"fts_phrase requires a literal query string, got: ${m.right.sql}")
      case m: FtsPhraseWild => throw new IllegalArgumentException(
        s"fts_phrase_wild requires a literal slot string, got: ${m.right.sql}")
      case m: FtsPrefix => throw new IllegalArgumentException(
        s"fts_prefix requires a literal prefix string, got: ${m.right.sql}")
      case m: FtsWildcard => throw new IllegalArgumentException(
        s"fts_wildcard requires a literal pattern string, got: ${m.right.sql}")
      case m: FtsNear => throw new IllegalArgumentException(
        "fts_near requires literal string terms and a literal INT slop, got: " +
          s"${m.sql}")
      case m: FtsFuzzy => throw new IllegalArgumentException(
        "fts_fuzzy requires a literal string term and a literal INT edit " +
          s"distance, got: ${m.sql}")
      case m: FtsTermRange => throw new IllegalArgumentException(
        "fts_term_range requires literal string bounds and literal BOOLEAN " +
          s"inclusivity flags, got: ${m.sql}")
      // fts_score that survived pass 0: no registered index, a computed (not
      // base-column) text argument, a non-literal query, or an unsupported
      // position. Corpus statistics (df, avgdl, N) live in the persisted
      // index, so there is no scan lowering — fail with the remedy.
      case m: FtsScore => throw new IllegalArgumentException(
        s"fts_score could not be lowered (got: ${m.sql}). It requires: a literal " +
          "query string; the scored column to be the indexed text column of a " +
          "table with a registered fresh index (graft.fts.Index.createIndex); " +
          "and use in a SELECT list, WHERE, ORDER BY, GROUP BY, or aggregate. " +
          "BM25 needs corpus statistics, which live in the index — there is " +
          "no scan fallback.")
    }
  }
}

/** Session extensions: the full-text function surface + the rewrite rule.
  * Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.ext.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.allFunctions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteFtsMatch)
  }
}

object GraftExtensions {
  /** The complete graft SQL function surface — fts + vector + text kernels.
    * ONE list feeds both installation paths, so a session built with
    * `spark.sql.extensions=graft.ext.GraftExtensions` and one patched by
    * [[install]] expose identical functions. */
  def allFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (new FunctionIdentifier("fts_tokenize"),
        new ExpressionInfo(classOf[FtsTokenize].getName, "fts_tokenize"),
        (args: Seq[Expression]) => FtsTokenize(args.head)),
      (new FunctionIdentifier("fts_match"),
        new ExpressionInfo(classOf[FtsMatch].getName, "fts_match"),
        (args: Seq[Expression]) => FtsMatch(args(0), args(1))),
      (new FunctionIdentifier("fts_match_any"),
        new ExpressionInfo(classOf[FtsMatchAny].getName, "fts_match_any"),
        (args: Seq[Expression]) => FtsMatchAny(args(0), args(1))),
      (new FunctionIdentifier("fts_match_min"),
        new ExpressionInfo(classOf[FtsMatchMin].getName, "fts_match_min"),
        (args: Seq[Expression]) => FtsMatchMin(args(0), args(1), args(2))),
      (new FunctionIdentifier("fts_phrase"),
        new ExpressionInfo(classOf[FtsPhrase].getName, "fts_phrase"),
        (args: Seq[Expression]) => FtsPhrase(args(0), args(1))),
      (new FunctionIdentifier("fts_phrase_wild"),
        new ExpressionInfo(classOf[FtsPhraseWild].getName, "fts_phrase_wild"),
        (args: Seq[Expression]) => FtsPhraseWild(args(0), args(1))),
      (new FunctionIdentifier("fts_score"),
        new ExpressionInfo(classOf[FtsScore].getName, "fts_score"),
        (args: Seq[Expression]) => FtsScore(args(0), args(1))),
      (new FunctionIdentifier("fts_prefix"),
        new ExpressionInfo(classOf[FtsPrefix].getName, "fts_prefix"),
        (args: Seq[Expression]) => FtsPrefix(args(0), args(1))),
      (new FunctionIdentifier("fts_near"),
        new ExpressionInfo(classOf[FtsNear].getName, "fts_near"),
        (args: Seq[Expression]) => FtsNear(args(0), args(1), args(2), args(3))),
      (new FunctionIdentifier("fts_phrase_slop"),
        new ExpressionInfo(classOf[FtsPhraseSlop].getName, "fts_phrase_slop"),
        (args: Seq[Expression]) => FtsPhraseSlop(args(0), args(1), args(2))),
      (new FunctionIdentifier("fts_snippet"),
        new ExpressionInfo(classOf[FtsSnippet].getName, "fts_snippet"),
        (args: Seq[Expression]) => FtsSnippet(args(0), args(1), args(2))),
      (new FunctionIdentifier("fts_wildcard"),
        new ExpressionInfo(classOf[FtsWildcard].getName, "fts_wildcard"),
        (args: Seq[Expression]) => FtsWildcard(args(0), args(1))),
      (new FunctionIdentifier("fts_fuzzy"),
        new ExpressionInfo(classOf[FtsFuzzy].getName, "fts_fuzzy"),
        (args: Seq[Expression]) => FtsFuzzy(args(0), args(1), args(2))),
      (new FunctionIdentifier("fts_regexp"),
        new ExpressionInfo(classOf[FtsRegexp].getName, "fts_regexp"),
        (args: Seq[Expression]) => FtsRegexp(args(0), args(1))),
      // `fts_term_range(text, lo, hi[, incl_lo, incl_hi])` — dictionary
      // range query (bounds default inclusive, Lucene's `[lo TO hi]`)
      (new FunctionIdentifier("fts_term_range"),
        new ExpressionInfo(classOf[FtsTermRange].getName, "fts_term_range"),
        (args: Seq[Expression]) => args.length match {
          case 3 => FtsTermRange(args(0), args(1), args(2),
            org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral,
            org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
          case 5 => FtsTermRange(args(0), args(1), args(2), args(3), args(4))
          case n => throw new org.apache.spark.sql.AnalysisException(
            "_LEGACY_ERROR_USER_RAISED_EXCEPTION",
            Map("errorMessage" ->
              s"fts_term_range(text, lo, hi[, incl_lo, incl_hi]) takes 3 or 5 arguments, got $n"),
            None)
        }),
      // `fts_query(text, 'a AND ("b c" OR d*) NOT e')` — the Lucene-style
      // query language. Parsed ONCE here (the query must be a foldable
      // string — a literal or a constant expression) and expanded into the
      // existing FTS leaf expressions glued with Catalyst And/Or/Not, so
      // each leaf takes its own RewriteFtsMatch lowering (index semi-join /
      // OR-union / anti-join / scan kernel) exactly as if written by hand.
      // Pure front-end: no new execution machinery — the ExpressionInfo
      // marker class is QueryParser, which builds the composite tree.
      (new FunctionIdentifier("fts_query"),
        new ExpressionInfo(graft.fts.QueryParser.getClass.getName, null,
          "fts_query",
          "fts_query(text, query) - Lucene-style query-string search: " +
            "bare terms (implicit AND), \"quoted phrases\", trailing-* " +
            "prefix, single inner/leading * wildcard, term~k fuzzy, " +
            "[lo TO hi] / {lo TO hi} term ranges, a NEAR/k b, term^w and " +
            "\"phrase\"^w boosts, +required/-prohibited operators, " +
            "field:term scoping to another indexed column, and AND/OR/NOT " +
            "with parentheses. The query must be a constant (foldable) " +
            "string; it is parsed at analysis time and expanded into the " +
            "fts_match/fts_phrase/fts_prefix/fts_wildcard/fts_fuzzy/" +
            "fts_term_range/fts_near expression tree.",
          ""),
        (args: Seq[Expression]) => {
          def analysisError(msg: String): Nothing =
            throw new org.apache.spark.sql.AnalysisException(
              "_LEGACY_ERROR_USER_RAISED_EXCEPTION",
              Map("errorMessage" -> msg), None)
          if (args.length != 2) analysisError(
            s"fts_query(text, 'query string') takes 2 arguments, got ${args.length}")
          val qe = args(1)
          if (qe.dataType != StringType || !qe.foldable) analysisError(
            s"fts_query requires a constant (foldable) query string, got: ${qe.sql}")
          val q = qe.eval() match {
            case null => analysisError("fts_query query string must not be NULL")
            case s: UTF8String => s.toString
          }
          try graft.fts.QueryParser.compile(args(0), q)
          catch { case e: IllegalArgumentException => analysisError(e.getMessage) }
        }),
      // `fts_query_score(text, '<query string>')` — RANKED retrieval for
      // the query language: the document's BM25 score for the query's
      // positive scoring terms (Term leaves, phrase terms, NEAR operands;
      // Prefix/Wildcard/Fuzzy clauses and NOT subtrees filter but don't
      // score — Lucene's constant-score treatment of multi-term and
      // prohibited clauses). Compiles at analysis time to [[FtsScore]]
      // over the extracted term bag, so the whole ranked-retrieval
      // machinery (pass-0 scoring join over pruned postings, the
      // covering-index plan, TakeOrderedAndProject top-k) applies
      // unchanged. Pair with `WHERE fts_query(text, <same string>)` for
      // the boolean match set.
      (new FunctionIdentifier("fts_query_score"),
        new ExpressionInfo(graft.fts.QueryParser.getClass.getName, null,
          "fts_query_score",
          "fts_query_score(text, query) - BM25 score of the document for " +
            "the query string's positive scoring terms (bare terms, phrase " +
            "terms, NEAR operands; prefix/wildcard/fuzzy and NOT clauses " +
            "filter only). Requires a registered index; compose with " +
            "fts_query(text, query) for the boolean match set and " +
            "ORDER BY … LIMIT k for top-k.",
          ""),
        (args: Seq[Expression]) => {
          def analysisError(msg: String): Nothing =
            throw new org.apache.spark.sql.AnalysisException(
              "_LEGACY_ERROR_USER_RAISED_EXCEPTION",
              Map("errorMessage" -> msg), None)
          if (args.length != 2) analysisError(
            s"fts_query_score(text, 'query string') takes 2 arguments, got ${args.length}")
          val qe = args(1)
          if (qe.dataType != StringType || !qe.foldable) analysisError(
            s"fts_query_score requires a constant (foldable) query string, got: ${qe.sql}")
          val q = qe.eval() match {
            case null => analysisError("fts_query_score query string must not be NULL")
            case s: UTF8String => s.toString
          }
          val weights =
            try graft.fts.QueryParser.scoringWeights(graft.fts.QueryParser.parse(q))
            catch { case e: IllegalArgumentException => analysisError(e.getMessage) }
          if (weights.isEmpty) analysisError(
            s"fts_query_score: query '$q' has no scoring terms (only " +
              "prefix/wildcard/fuzzy/NOT clauses) — nothing to rank by")
          // one FtsScore per distinct boost, summed with the boost as a
          // plain multiplier: Σ_w w·bm25(terms_w). An unboosted query is a
          // single weight-1.0 group — exactly one FtsScore, so the
          // covering-index plan is preserved; each boosted group adds one
          // more scoring join over its own pruned postings (clauses are
          // additive in Lucene too, so `a AND a^2` scores 3·bm25(a)).
          val groups = weights.distinct.groupBy(_._2).toSeq.sortBy(_._1)
          val parts: Seq[Expression] = groups.map { case (w, ts) =>
            val fs: Expression = FtsScore(args(0),
              org.apache.spark.sql.catalyst.expressions.Literal(
                UTF8String.fromString(ts.map(_._1).distinct.mkString(" ")),
                StringType))
            if (w == 1.0) fs
            else org.apache.spark.sql.catalyst.expressions.Multiply(
              org.apache.spark.sql.catalyst.expressions.Literal(w), fs)
          }
          parts.reduce((a, b) =>
            org.apache.spark.sql.catalyst.expressions.Add(a, b))
        })
    ) ++ VecKernels.functions ++ TextKernels.functions

  /** Register the graft functions + rule on an already-built session (the
    * harness receives driver-owned sessions; extensions can't be added
    * post-hoc via builder, but the internals are session-state-local). */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    allFunctions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
    // post-hoc rule injection isn't part of the public API; the supported
    // path is spark.sql.extensions=graft.ext.GraftExtensions. For harness
    // sessions we fall back to experimental extraOptimizations, which the
    // optimizer runs as its own batch.
    if (!spark.experimental.extraOptimizations.contains(RewriteFtsMatch)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteFtsMatch
    }
  }
}
