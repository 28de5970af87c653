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

  // The regex lint encodes TODAY's DuckDB widening rules; a DuckDB version
  // bump that changes them would break the driver's hash compare without
  // touching this repo's source. This probe asks the ACTUAL oracle engine:
  // DESCRIBE (binder-only — no execution) every oracle over the sf0.001
  // views and fail the build on any column typed HUGEINT or DECIMAL(38,·)
  // — the two widening targets Spark's 64-bit/double surface can't hash-
  // match. Narrower DECIMALs pass: they only arise from explicit casts
  // pinned identically on both sides (q_zonemap's DECIMAL(18,2)).
  test("DuckDB DESCRIBE probe: no oracle column widens to HUGEINT/DECIMAL(38)") {
    val checker = java.io.File.createTempFile("oracle_describe", ".py")
    val oracles = java.io.File.createTempFile("oracle_sql", ".json")
    try {
      val json = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", " ").replace("\t", " ") + "\""
      }.mkString("{", ",\n", "}")
      java.nio.file.Files.write(oracles.toPath, json.getBytes("UTF-8"))
      java.nio.file.Files.write(checker.toPath,
        """import sys, os, json, glob
          |try:
          |    import duckdb
          |except ImportError:
          |    print("SKIP: no duckdb"); sys.exit(0)
          |oracle = json.load(open(sys.argv[1])); sf = sys.argv[2]
          |con = duckdb.connect()
          |for p in glob.glob(os.path.join(sf, '*.parquet')):
          |    t = os.path.basename(p)[:-len('.parquet')]
          |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
          |bad = []
          |for name, sql in sorted(oracle.items()):
          |    try:
          |        rows = con.execute("DESCRIBE " + sql).fetchall()
          |    except Exception as e:
          |        bad.append(f"{name}: DESCRIBE failed: {str(e)[:160]}")
          |        continue
          |    for col, typ, *_ in rows:
          |        if 'HUGEINT' in typ.upper() or typ.upper().startswith('DECIMAL(38'):
          |            bad.append(f"{name}: column '{col}' types as {typ}")
          |print("\n".join(bad) if bad else "OK")
          |""".stripMargin.getBytes("UTF-8"))
      val sfDir = "/root/testdata/sf0.001"
      assume(new java.io.File(sfDir).isDirectory, "fixtures not present")
      val out = new StringBuilder
      val rc = scala.sys.process.Process(Seq("python3",
          checker.getAbsolutePath, oracles.getAbsolutePath, sfDir))
        .run(scala.sys.process.ProcessLogger(l => out.append(l).append('\n')))
        .exitValue()
      val text = out.result().trim
      assume(rc == 0 && !text.startsWith("SKIP"),
        s"oracle engine unavailable for the probe: $text")
      assert(text == "OK", s"divergent oracle output types:\n$text")
    } finally { checker.delete(); oracles.delete() }
  }
}
