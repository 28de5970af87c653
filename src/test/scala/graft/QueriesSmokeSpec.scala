package graft

/** Every registered query must run at sf0.001 with a stable schema. Queries
  * whose results are legitimately empty at this sf are exempted from the
  * rows>0 assertion (the oracle compare still checks them at sf0.01).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set(
    "q_dedup_embed",     // no embedding pairs at cos ≥ 0.8 in the fixture
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram", // sf-dependent
    "q_join_anti", "q_subq_corr", // every customer may have orders
    "q_graph_kcore") // sf0.001's ~1.7-avg-degree graph has no 12-core;
                     // the sf0.01 oracle drive pins the 848-node core

  test("every query has an oracle or documented rows-only status") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, "result must have columns")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
