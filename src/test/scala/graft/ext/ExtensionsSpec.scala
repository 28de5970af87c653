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

  test("fts_match with no usable terms is false, not an error") {
    GraftExtensions.install(spark)
    spark.read.parquet(sf("documents")).createOrReplaceTempView("docs_ext")
    val n = spark.sql(
      "SELECT count(*) FROM docs_ext WHERE fts_match(text, '!!! ...')").collect()(0).getLong(0)
    assert(n == 0)
  }
}
