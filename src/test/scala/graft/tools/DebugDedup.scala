package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Dedup

/** Scratch timing harness for the dedup pipeline stages (not part of the
  * driver contract). */
object DebugDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sets = time("shingleSets build+count") {
      val s = Dedup.shingleSets(docs); s.count(); s
    }
    println(s"[debug] partitions = ${sets.rdd.getNumPartitions}")
    val cand = time("minhashCandidates") {
      val c = Dedup.minhashCandidates(sets); c.count(); c
    }
    time("verifyJaccard") {
      Dedup.verifyJaccard(cand, sets, 0.8).count()
    }
    spark.stop()
  }
}
