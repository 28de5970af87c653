package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the q_fts_skew_serving AQE skew split (not a test). */
object DebugSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    if (sys.env.get("FORCE_SKEW").contains("1"))
      s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.planChangeLog.level", "ERROR")
    s.conf.set("spark.sql.planChangeLog.rules",
      "org.apache.spark.sql.execution.adaptive.OptimizeSkewedJoin")
    s.conf.set("spark.sql.adaptive.logLevel", "ERROR")
    val docs2 = graft.core.Tables(s, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" "),
        expr("repeat('the ', CAST(doc_id % 80 AS INT))")).as("text"))
    val terms = Seq("the", "data", "dup")
    val ix = graft.fts.Index.buildPositional(docs2)
    val qp = ix.postings.filter(col("term").isin(terms: _*))
      .repartition(16)
    val dfT = qp.groupBy("term")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val joined = qp.hint("merge").join(dfT, "term")
    val df = joined
      .groupBy("doc_id").agg(sum(col("tf")).as("x"),
        min(array_min(col("positions"))).as("fp"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("HAS_SKEW=" + (plan.contains("skew=true") ||
      plan.contains("isSkewJoin=true")))
    println(plan.take(5000))
    spark.stop()
  }
}
