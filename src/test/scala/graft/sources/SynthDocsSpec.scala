package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 plugin source's API contract: pushdown really clips the
  * planned partitions, pruning really narrows the read schema, residual
  * predicates stay Spark-side and correct, and the generated rows match
  * their closed-form definition. */
class SynthDocsSpec extends SparkSpec {

  private def synth(rows: Long, parts: Int = 8) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    val walker = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    walker.collect(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }.head
  }

  test("doc_id range predicates clip the planned partitions") {
    val df = synth(100000).filter(col("doc_id") >= 1000 && col("doc_id") < 50000)
      .select("doc_id")
    val scan = scanOf(df)
    assert(scan.scan.description().contains("range=[1000,50000)"),
      s"pushdown must clip the generated range: ${scan.scan.description()}")
    assert(df.count() == 49000)
    // a fully-clipped range plans ZERO partitions — and zero tasks
    val none = synth(100000).filter(col("doc_id") < 0)
    assert(scanOf(none.select("doc_id")).inputRDD.getNumPartitions == 0 ||
      none.count() == 0)
  }

  test("column pruning reaches the reader schema (text never built)") {
    val df = synth(1000).select("doc_id", "lang")
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("doc_id", "lang"),
      s"pruned schema must exclude text/n_tokens: ${scan.scan.readSchema()}")
    assert(df.count() == 1000)
  }

  test("non-range predicates stay residual and still filter correctly") {
    val df = synth(4000).filter(col("lang") === "en").select("doc_id")
    // lang is not consumable by the source: rows still correct
    assert(df.count() == 1000)
    assert(df.agg(min("doc_id"), max("doc_id")).collect()(0).toSeq == Seq(0L, 3996L))
  }

  test("generated rows match their closed form") {
    val rows = synth(64, parts = 5).orderBy("doc_id").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == SynthDocs.Langs((id % 4).toInt))
      assert(r.getInt(2) == 1 + (id % 32).toInt)
      val toks = r.getString(3).split(" ")
      assert(toks.length == r.getInt(2))
      assert(toks.head == "w" + (id % 16))
    }
    // parallelism: the planned partition count follows the option
    assert(scanOf(synth(64, parts = 5).select("doc_id"))
      .inputRDD.getNumPartitions == 5)
  }

  test("micro-batch stream admits rowsPerBatch per trigger and drains") {
    val q = spark.readStream.format("graft-synth")
      .option("rows", 1000).option("partitions", 3)
      .option("rowsPerBatch", 120).load()
      .groupBy("lang").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.format("memory").queryName("synth_mb")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // 1000 rows at 120/trigger: at least 9 non-empty micro-batches —
      // the offset log is real admission control, not one giant batch
      assert(q.recentProgress.count(_.numInputRows > 0) >= 9,
        q.recentProgress.map(p => p.batchId -> p.numInputRows).mkString(","))
      val total = spark.table("synth_mb")
        .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
      assert(total == 1000L)
    } finally q.stop()
  }
}
