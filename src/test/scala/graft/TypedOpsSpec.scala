package graft

import org.apache.spark.sql.functions._

/** Typed Dataset operator surface (SURVEY.md §2.11, reference
  * execution/objects.scala: MapElements/MapGroups/CoGroup, Dataset
  * map/flatMap/mapPartitions, KeyValueGroupedDataset reduceGroups/cogroup). */
class TypedOpsSpec extends SparkSpec {

  private case class N(k: Int, name: String)

  test("flatMap / mapPartitions / reduceGroups") {
    val sparkS = spark
    import sparkS.implicits._
    val words = Seq("big data", "fast data").toDS()
      .flatMap(_.split(" "))
    assert(words.collect().sorted.toSeq == Seq("big", "data", "data", "fast"))

    val perPart = Seq(1, 2, 3, 4).toDS().repartition(2)
      .mapPartitions(it => Iterator(it.sum))
      .collect().sum
    assert(perPart == 10)

    val reduced = Seq(("a", 1), ("a", 2), ("b", 5)).toDS()
      .groupByKey(_._1)
      .reduceGroups((x, y) => (x._1, x._2 + y._2))
      .map { case (k, (_, v)) => (k, v) }
      .collect().toMap
    assert(reduced == Map("a" -> 3, "b" -> 5))
  }

  test("cogroup joins typed groups with custom logic") {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq((1, "l1"), (1, "l2"), (2, "l3")).toDS().groupByKey(_._1)
    val right = Seq((1, "r1"), (3, "r2")).toDS().groupByKey(_._1)
    val out = left.cogroup(right) { (k, ls, rs) =>
      Iterator((k, ls.size, rs.size))
    }.collect().sortBy(_._1).toSeq
    assert(out == Seq((1, 2, 1), (2, 1, 0), (3, 0, 1)))
  }

  test("catalog + DDL surface: views, cache, describe, functions") {
    spark.read.parquet(sf("region")).createOrReplaceTempView("region_ddl")
    assert(spark.catalog.tableExists("region_ddl"))

    spark.sql("CACHE TABLE region_ddl")
    assert(spark.catalog.isCached("region_ddl"))
    spark.sql("UNCACHE TABLE region_ddl")
    assert(!spark.catalog.isCached("region_ddl"))

    val desc = spark.sql("DESCRIBE region_ddl").collect().map(_.getString(0))
    assert(desc.contains("r_regionkey") && desc.contains("r_name"))

    val viaSql = spark.sql(
      "CREATE OR REPLACE TEMPORARY VIEW region_top AS SELECT * FROM region_ddl WHERE r_regionkey < 3")
    assert(spark.table("region_top").count() == 3)
    spark.sql("DROP VIEW region_top")
    assert(!spark.catalog.tableExists("region_top"))

    assert(spark.catalog.functionExists("approx_count_distinct"))
    val show = spark.sql("SHOW FUNCTIONS LIKE 'approx*'").collect().map(_.getString(0))
    assert(show.contains("approx_count_distinct"))
  }

  test("RDD bridge: createDataset/createDataFrame over an RDD and back") {
    // §2.1 RDDScanExec / ExternalRDDScanExec (reference ExistingRDD.scala:
    // 158/:106): an existing RDD enters the declarative engine and a
    // Dataset exits to RDD land — the interop boundary, not a hot path.
    val sparkS = spark
    import sparkS.implicits._
    val rdd = spark.sparkContext.parallelize(Seq((1L, "a"), (2L, "b"), (3L, "c")), 2)
    val ds = spark.createDataset(rdd)
    assert(ds.filter(_._1 > 1).count() == 2)
    val df = spark.createDataFrame(rdd).toDF("id", "s")
    assert(df.where($"s" === "b").select("id").as[Long].head() == 2L)
    val back = df.rdd.map(_.getLong(0)).collect().sorted.toSeq
    assert(back == Seq(1L, 2L, 3L))
  }

  test("ANALYZE TABLE feeds CBO statistics the optimizer can read") {
    // the reference's AnalyzeTableCommand (AnalyzeTableCommand.scala:35)
    // populated sizeInBytes for broadcast decisions; Spark 4's CBO adds row
    // counts and column stats. Catalog-table DDL + ANALYZE → stats visible
    // on the optimized plan — what drives join-side selection at scale.
    spark.sql("DROP TABLE IF EXISTS nation_stats")
    spark.read.parquet(sf("nation")).write.saveAsTable("nation_stats")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      // row counts surface in plan statistics only under CBO
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS FOR COLUMNS n_nationkey")
      val stats = spark.table("nation_stats").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"stats: $stats")
      val described = spark.sql("DESCRIBE EXTENDED nation_stats n_nationkey")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(described.get("distinct_count").contains("25"), described)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS nation_stats")
    }
  }
}
