package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.OracleLint

/** Hard gate for the DuckDB↔Spark result-TYPE divergence class (see
  * OracleLint's scaladoc). Runs as part of `sbt test`, so an unpinned
  * integer/decimal aggregate in a NEW oracle fails the build instead of
  * surfacing as a hash mismatch in the next round's CORRECTNESS report. */
class OracleLintSpec extends AnyFunSuite {

  test("oracle corpus is free of type-divergent aggregates") {
    val viols = OracleLint.lintAll(SparkEntry.oracleSql)
    assert(viols.isEmpty, viols.mkString("\n  ", "\n  ", ""))
  }

  // Regression: the exact round-10 failures must be flagged.
  test("flags the r10 HUGEINT class: integer sum without CAST") {
    val sql =
      """SELECT g, count(*) AS n, sum(l_partkey) AS pk
         FROM lineitem GROUP BY g ORDER BY g"""
    assert(OracleLint.lint("q", sql).exists(_.contains("sum(l_partkey)")))
  }

  test("flags integer-literal sums (range source, r10 stream plugin)") {
    val sql =
      """SELECT count(*) AS n, sum(1 + range % 32) AS toks
         FROM range(0, 3000) GROUP BY 1"""
    assert(OracleLint.lint("q", sql).nonEmpty)
  }

  test("accepts the repo's pin patterns") {
    val ok = Seq(
      "SELECT CAST(sum(l_partkey) AS BIGINT) AS pk FROM lineitem",
      "SELECT sum(code)::BIGINT AS cs FROM t",
      "SELECT round(sum(value), 2) AS sv FROM events",
      // sum over provably-DOUBLE input needs no pin
      "SELECT sum(l_quantity) AS qty FROM lineitem",
      "SELECT sum(x * 0.5) AS s FROM t",
      "SELECT sum(ln(df + 1.0)) AS s FROM t")
    ok.foreach(sql => assert(OracleLint.lint("q", sql).isEmpty, sql))
  }

  test("flags integer sums defined inside a CTE (flow-through)") {
    val sql =
      """WITH agg AS (SELECT g, sum(l_partkey) AS pk FROM lineitem GROUP BY g)
         SELECT g, pk FROM agg ORDER BY g"""
    assert(OracleLint.lint("q", sql).nonEmpty)
  }

  test("flags unpinned decimal sums only in the final projection") {
    val bad =
      """SELECT g, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
         FROM lineitem GROUP BY g"""
    assert(OracleLint.lint("q", bad).exists(_.contains("decimal")))
    // HAVING-position decimal sum is same-engine-consistent → accepted
    val having =
      """SELECT c_name, count(*) AS n FROM customer GROUP BY c_name
         HAVING sum(CAST(c_acctbal AS DECIMAL(18,2))) > 200"""
    assert(OracleLint.lint("q", having).isEmpty)
    // output-pinned CTE decimal sum (the q_tpch_q15 shape) → accepted
    val pinnedCte =
      """WITH revenue AS (
           SELECT l_suppkey AS k,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS total
           FROM lineitem GROUP BY l_suppkey)
         SELECT k, CAST(total AS DOUBLE) AS total FROM revenue"""
    assert(OracleLint.lint("q", pinnedCte).isEmpty)
  }

  test("string literals cannot confuse the scanner") {
    val sql =
      "SELECT count(*) AS n FROM t WHERE s = 'sum(l_partkey) (('"
    assert(OracleLint.lint("q", sql).isEmpty)
  }
}
