package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup scaling harness: the paper's usage scales the cluster count
  * with the corpus (nlist ∝ N keeps E[cluster] and so within-cluster
  * pair work constant per document). Times semDedup at 1× with nlist=16
  * vs ×N with BOTH nlist=16 (the naive fixed-parameter read ScaleSpot
  * reports) and nlist=16·N (the operator's documented regime).
  *
  *   sbt "Test/runMain graft.tools.DebugSemDedup 10"
  */
object DebugSemDedup {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val base = "/root/testdata/sf0.1"
    val out = s"/root/repo/target/sfscale_x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def ensure(name: String)(build: => Unit): Unit =
      if (!new java.io.File(s"$out/$name.parquet").exists()) build
    ensure("embeddings")(ScaleCorpus.embeddings(spark, out, factor))

    def run(dir: String, nlist: Int): Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      graft.pipeline.Dedup.semDedup(emb, nlist = nlist)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    run(base, 16) // warm
    val t1 = math.min(run(base, 16), run(base, 16))
    val tNfixed = math.min(run(out, 16), run(out, 16))
    val tNscaled = math.min(run(out, 16 * factor), run(out, 16 * factor))
    println(f"""{"semdedup_x$factor":{"t_1x_nlist16":$t1%.2f,""" +
      f""""t_${factor}x_nlist16":$tNfixed%.2f,"ratio_fixed":${tNfixed / t1}%.2f,""" +
      f""""t_${factor}x_nlist${16 * factor}":$tNscaled%.2f,""" +
      f""""ratio_scaled":${tNscaled / t1}%.2f}}""")
    spark.stop()
  }
}
