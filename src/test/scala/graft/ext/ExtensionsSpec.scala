package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom Catalyst surface: native tokenizer expression (with codegen),
  * fts_match rewrite rule, SQL registration. */
class ExtensionsSpec extends SparkSpec {

  test("fts_tokenize expression matches Analyzer.tokenize semantics") {
    GraftExtensions.install(spark)
    import spark.implicits._
    Seq(("Hello, WORLD!! 42", 1)).toDF("text", "id").createOrReplaceTempView("t_ext")
    val native = spark.sql("SELECT fts_tokenize(text) AS toks FROM t_ext")
      .collect()(0).getSeq[String](0)
    assert(native == Seq("hello", "world", "42"))
    val viaColumns = Seq("Hello, WORLD!! 42").toDF("text")
      .select(graft.fts.Analyzer.tokenize(col("text"))).collect()(0).getSeq[String](0)
    assert(native == viaColumns, "native expression and column composition must agree")
  }

  test("fts_tokenize survives whole-stage codegen over the fixture") {
    GraftExtensions.install(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_ext")
    val n = spark.sql(
      "SELECT sum(size(fts_tokenize(text))) FROM docs_ext").collect()(0).getLong(0)
    assert(n > 0)
  }

  test("fts_match rewrites to array_contains conjunction and filters correctly") {
    GraftExtensions.install(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_ext")
    val df = spark.sql(
      "SELECT doc_id FROM docs_ext WHERE fts_match(text, 'spark query')")
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[FtsMatch])),
      "rule must eliminate FtsMatch before execution")
    assert(optimized.toString.contains("array_contains"),
      s"expected array_contains lowering, got:\n$optimized")
    // semantics agree with the library path
    val expect = graft.fts.Search.matchAllIds(
        graft.fts.Index.build(spark.read.parquet(sf("documents"))), Seq("spark", "query"))
      .collect().map(_.getLong(0)).toSet
    assert(df.collect().map(_.getLong(0)).toSet == expect)
  }

  test("fts_match over a registered table lowers to a postings semi-join") {
    GraftExtensions.install(spark)
    val docsPath = sf("documents")
    val ixDir = "/root/repo/target/ttmp/fts_index_spec"
    graft.fts.Index.write(graft.fts.Index.build(spark.read.parquet(docsPath)), ixDir)
    graft.fts.IndexCatalog.register(docsPath, ixDir)
    try {
      spark.read.parquet(docsPath).createOrReplaceTempView("docs_ix_spec")
      val df = spark.sql(
        "SELECT doc_id FROM docs_ix_spec WHERE fts_match(text, 'spark query')")
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }.nonEmpty, s"expected a left-semi join against the postings, got:\n$optimized")
      assert(!optimized.toString.contains("array_contains"),
        "indexed path must not fall back to the scan lowering")
      // identical rows to the scan-based lowering on an unregistered view
      val expect = graft.fts.Search.matchAllIds(
          graft.fts.Index.build(spark.read.parquet(docsPath)), Seq("spark", "query"))
        .collect().map(_.getLong(0)).toSet
      assert(df.collect().map(_.getLong(0)).toSet == expect)
    } finally graft.fts.IndexCatalog.clear()
  }

  test("fts_match with NULL query is null-filtered, not an execution crash") {
    GraftExtensions.install(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_ext")
    val n = spark.sql(
      "SELECT count(*) FROM docs_ext WHERE fts_match(text, NULL)").collect()(0).getLong(0)
    assert(n == 0)
    val nAny = spark.sql(
      "SELECT count(*) FROM docs_ext WHERE fts_match_any(text, NULL)").collect()(0).getLong(0)
    assert(nAny == 0)
  }

  test("fts_match with a non-literal query fails with a clear message") {
    GraftExtensions.install(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_ext")
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM docs_ext WHERE fts_match(text, lang)").collect()
    }
    assert(e.getMessage.contains("literal query string"), e.getMessage)
  }

  test("graft_dot SQL function: exact dot, null on ragged arrays") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").collect()(0)
    assert(r.getDouble(0) == 11.0)
    val ragged = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d))").collect()(0)
    assert(ragged.isNullAt(0), "length mismatch must be NULL, not a partial sum")
  }

  test("graft_intersect_card is correct on unsorted input (fallback path)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val sorted = new GenericArrayData(Array(1L, 3L, 7L))
    val unsorted = new GenericArrayData(Array(7L, 1L, 3L))
    assert(TextKernels.intersectCard(sorted, sorted) == 3)
    assert(TextKernels.intersectCard(unsorted, sorted) == 3)
    assert(TextKernels.intersectCard(
      new GenericArrayData(Array(3L, 1L)), new GenericArrayData(Array(1L, 3L))) == 2)
  }

  test("fts_match with no usable terms is false, not an error") {
    GraftExtensions.install(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_ext")
    val n = spark.sql(
      "SELECT count(*) FROM docs_ext WHERE fts_match(text, '!!! ...')").collect()(0).getLong(0)
    assert(n == 0)
  }
}
