package graft.core

/** Build-time lint over the oracle SQL corpus for the recurring
  * result-TYPE divergence class between DuckDB and Spark, which the
  * driver's hash compare is sensitive to even when every value matches:
  *
  *   - `sum`/`list_sum`/`product` over INTEGER inputs: DuckDB widens to
  *     HUGEINT (INT128), Spark emits BIGINT → hash mismatch (round-10
  *     failures q_join_skew_aqe / q_stream_source_plugin).
  *   - `sum` over DECIMAL inputs: both engines widen precision but to
  *     different targets (DuckDB DECIMAL(38,s), Spark DECIMAL(p+10,s))
  *     → hash mismatch unless the output is re-cast (round-9 failures).
  *
  * The repo's determinism rule is: every divergent aggregate reaching the
  * output must be pinned with an explicit `CAST(... AS BIGINT/DOUBLE)` /
  * `::TYPE` / `round(...)`. This lint enforces that rule mechanically so
  * the class is a build failure (OracleLintSpec + a Verify startup sweep)
  * instead of a once-a-round CORRECTNESS surprise.
  *
  * Typing a SQL string fully would need a real analyzer; instead the lint
  * leans on the fact that the fixture schemas are FROZEN (TESTDATA.md):
  * the integer-typed columns of the ten tables (plus DuckDB's `range`)
  * are known, so "sum over an integer expression" is decidable for every
  * oracle in the corpus. Expressions referencing only unknown aliases are
  * conservatively accepted — aliases of integer sums are caught at their
  * definition site because the INTEGER rule scans the whole statement
  * (CTEs included), not just the final projection. The DECIMAL rule scans
  * only the final projection: intermediate decimal comparisons (HAVING,
  * WHERE) are same-engine-consistent and outer casts pin the output.
  */
object OracleLint {

  /** Integer-typed columns of the frozen fixture tables + range(). */
  private val IntCols: Set[String] = Set(
    "c_custkey", "c_nationkey", "doc_id", "n_chars", "vec_id", "label",
    "event_id", "user_id", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "n_nationkey", "n_regionkey", "o_orderkey", "o_custkey",
    "p_partkey", "p_size", "r_regionkey", "s_suppkey", "s_nationkey",
    "range", "ts")

  private val Divergent = raw"\b(sum|list_sum|product)\s*\(".r
  private val Pin = raw"\b(cast|try_cast|round)\s*\(".r
  private val FloatMarker =
    raw"(?s)(::\s*double|as\s+double|\d\.\d|\bln\s*\(|\bexp\s*\(|\bsqrt\s*\(|\bpow\s*\(|/)".r
  private val Ident = raw"\b[a-z_][a-z0-9_]*\b".r
  private val Keywords = Set("sum", "list_sum", "product", "coalesce",
    "when", "case", "then", "else", "end", "and", "or", "not", "filter",
    "where", "over", "partition", "by", "order", "distinct", "null", "is",
    "in", "between", "rows", "preceding", "following", "current", "row",
    "unbounded", "asc", "desc", "greatest", "least", "abs", "if", "ifnull")
  private val DecimalArg = raw"(?s)(::\s*decimal|as\s+decimal)".r

  /** Blank out single-quoted literal content (length-preserving) so
    * quoted text can't confuse paren matching or identifier scans. */
  private[core] def stripStrings(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      if (sql(i) == '\'') {
        out += '\''; i += 1
        var done = false
        while (i < sql.length && !done) {
          if (sql(i) == '\'' && i + 1 < sql.length && sql(i + 1) == '\'') {
            out ++= "  "; i += 2 // escaped quote
          } else if (sql(i) == '\'') { out += '\''; i += 1; done = true }
          else { out += ' '; i += 1 }
        }
      } else { out += sql(i); i += 1 }
    }
    out.result()
  }

  /** Index just past the matching close paren for the open paren at `open`,
    * or -1 if unbalanced. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var j = open
    while (j < s.length) {
      s(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    -1
  }

  /** [start, end) of the FINAL top-level SELECT's projection list. */
  private[core] def finalProjectionSpan(s: String): Option[(Int, Int)] = {
    val low = s.toLowerCase
    var depth = 0; var i = 0; var lastSel = -1
    def wordAt(kw: String, i: Int): Boolean =
      low.startsWith(kw, i) &&
        (i == 0 || !(low(i - 1).isLetterOrDigit || low(i - 1) == '_')) && {
          val j = i + kw.length
          j >= low.length || !(low(j).isLetterOrDigit || low(j) == '_')
        }
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && wordAt("select", i)) lastSel = i
      }
      i += 1
    }
    if (lastSel < 0) return None
    var j = lastSel + 6; depth = 0
    var end = s.length
    var found = false
    while (j < s.length && !found) {
      s(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && wordAt("from", j)) { end = j; found = true }
      }
      j += 1
    }
    Some((lastSel + 6, end))
  }

  /** Is the aggregate spanning [start, close] type-pinned — enclosed by a
    * CAST/TRY_CAST/round whose parens cover it, or suffixed with `::`? */
  private def pinned(s: String, low: String, start: Int, close: Int): Boolean = {
    if (low.startsWith("::", close + 1)) return true
    Pin.findAllMatchIn(low).exists { pm =>
      val open = low.indexOf('(', pm.start)
      open >= 0 && open < start && matchParen(s, open) > close
    }
  }

  /** All violations in one oracle; empty = clean. */
  def lint(name: String, sql: String): Seq[String] = {
    val s = stripStrings(sql)
    val low = s.toLowerCase
    val proj = finalProjectionSpan(s)
    val out = Seq.newBuilder[String]
    Divergent.findAllMatchIn(low).foreach { m =>
      val open = low.indexOf('(', m.start)
      val close = matchParen(s, open)
      if (close > 0 && !pinned(s, low, m.start, close)) {
        val arg = low.substring(open + 1, close)
        val inProjection =
          proj.exists { case (a, b) => m.start >= a && m.start < b }
        // DECIMAL class — only dangerous when the aggregate itself is in
        // the final output list (intermediates compare same-engine).
        if (inProjection && DecimalArg.findFirstIn(arg).isDefined)
          out += s"$name: unpinned decimal aggregate in output: " +
            oneLine(s, m.start, close)
        // INTEGER class — dangerous anywhere (CTE results flow to output);
        // decidable because the fixture integer columns are frozen.
        else if (FloatMarker.findFirstIn(arg).isEmpty) {
          val ids = Ident.findAllIn(arg).toSet -- Keywords
          if (ids.isEmpty || ids.exists(IntCols))
            out += s"$name: integer aggregate without CAST pin " +
              "(DuckDB widens to HUGEINT, Spark stays BIGINT): " +
              oneLine(s, m.start, close)
        }
      }
    }
    out.result()
  }

  private def oneLine(s: String, a: Int, b: Int): String =
    s.substring(a, math.min(b + 1, s.length)).split("\\s+").mkString(" ").take(120)

  /** Sweep a whole oracle corpus; returns every violation. */
  def lintAll(oracles: Map[String, String]): Seq[String] =
    oracles.toSeq.sortBy(_._1).flatMap { case (n, sql) => lint(n, sql) }
}
