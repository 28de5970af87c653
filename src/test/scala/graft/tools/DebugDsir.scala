package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev timing harness for the DSIR feature-extraction kernel swap: the
  * old higher-order `transform` formulation re-evaluated its non-lambda
  * subtree (the whole tokenize) per array element; the native
  * graft_bigram_buckets kernel runs once per row. Times the explode→count
  * of both over the given corpus in ONE JVM, alternating reps.
  *
  *   sbt "Test/runMain graft.tools.DebugDsir /root/testdata/sf0.1 3"
  */
object DebugDsir {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    val t = graft.fts.Analyzer.tokenize(col("text"))
    val starts = when(size(t) >= 2, sequence(lit(1), size(t) - 1))
      .otherwise(array().cast("array<int>"))
    val oldCol = transform(starts, i =>
      substring(md5(concat_ws(" ", element_at(t, i), element_at(t, i + 1))), 1, 3))
    val newCol = graft.pipeline.Lm.bigramBuckets(col("text"))

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(explode(c).as("b")).groupBy("b").count()
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[dsir] $label $s%.2f s")
      s
    }
    time("warmup(new)", newCol)
    val pairs = (1 to reps).map { _ => (time("hof", oldCol), time("native", newCol)) }
    val (o, n) = (pairs.map(_._1).min, pairs.map(_._2).min)
    println(f"[dsir] best hof=$o%.2f s native=$n%.2f s speedup=${o / n}%.2fx")
    spark.stop()
  }
}
