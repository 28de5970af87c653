package graft

import graft.SparkSpec

/** Plan-shape regression tests: the scale guarantees SCALE.md documents
  * (pushdown, pruning, bucketed no-shuffle joins, index-backed semi-join)
  * asserted against the formatted physical plan so they can't silently
  * regress. Textual assertions on explain output — the same evidence
  * `graft.Explain` prints for the per-round audit. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q_filter pushes predicates and prunes columns at the scan") {
    val plan = planOf("q_filter")
    assert(plan.contains("PushedFilters: [IsNotNull("), plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("l_comment"), "projection must prune unused columns")
  }

  test("q_sort_limit plans as TakeOrderedAndProject, not global sort") {
    val plan = planOf("q_sort_limit")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q_join_bucketed reads buckets on both sides (no join-side shuffle)") {
    val plan = planOf("q_join_bucketed")
    assert(plan.contains("SortMergeJoin"))
    assert("Bucketed: true".r.findAllIn(plan).size == 2,
      "both scans must be bucketed")
    // the SMJ consumes bucket-partitioned scans directly: the only
    // exchanges in the plan are the post-join aggregation/sort ones, so
    // exchange count must be exactly 2 (partial->final agg, then sort)
    assert("\\bExchange\\b".r.findAllIn(plan).size <= 4, // 2 nodes, each named twice in formatted output
      s"unexpected extra exchanges:\n${plan.linesIterator.take(25).mkString("\n")}")
  }

  test("q_fts_sql_indexed lowers to a partition-pruned postings semi-join") {
    graft.fts.IndexCatalog.clear()
    val plan = planOf("q_fts_sql_indexed")
    try {
      assert(plan.contains("LeftSemi"), "index path must be a semi-join")
      assert(plan.contains("PartitionFilters: [((bucket"),
        "postings scan must prune to the query terms' buckets")
      assert(plan.contains("PushedFilters: [In(term"),
        "term filter must push into the postings scan")
      assert(!plan.contains("fts_tokenize"),
        "indexed path must not re-tokenize the corpus")
    } finally graft.fts.IndexCatalog.clear()
  }

  test("q_fts_sql (unregistered) falls back to the codegen scan lowering") {
    val plan = planOf("q_fts_sql")
    assert(plan.contains("array_contains"), "scan path must lower to array_contains")
    assert(!plan.contains("LeftSemi"))
  }

  test("q_join_asof plans as window aggregation, never a nested-loop join") {
    val plan = planOf("q_join_asof")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "as-of must not plan a range-predicate join")
    assert(plan.contains("Window"), "as-of is a running-window fold")
  }

  test("q_join_range plans as an equi-join with the range as residual") {
    val plan = planOf("q_join_range")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "bucketized range join must not plan a nested loop")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bucket:\n${plan.linesIterator.take(20).mkString("\n")}")
  }

  test("q_join_star broadcasts the dimension chain, no cartesian anywhere") {
    val plan = planOf("q_join_star")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "supplier/nation/region must broadcast")
  }
}
