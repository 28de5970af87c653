package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Scratch timing harness for the ngram-blocking dedup stages (not part of
  * the driver contract). */
object DebugNgram {
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
    val inv = time("inv explode+persist") {
      val i = sets.select(col("doc_id"), size(col("hs")).as("m"),
        explode(col("hs")).as("s")).persist()
      println(s"[debug]   inv rows = ${i.count()}"); i
    }
    val dfs = time("df counts") {
      val d = inv.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > 1).persist()
      println(s"[debug]   shared shingles = ${d.count()}"); d
    }
    val keys = time("prefix-filter ranking") {
      import org.apache.spark.sql.expressions.Window
      val k = inv.join(dfs, "s")
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
        .filter(col("rn") <= col("m") - ceil(lit(0.8) * col("m")) + 1)
        .select("doc_id", "s").persist()
      println(s"[debug]   key rows = ${k.count()}"); k
    }
    val cand = time("self-join candidates") {
      val c = keys.as("a").join(keys.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("aid"), col("b.doc_id").as("bid"))
        .distinct().persist()
      println(s"[debug]   candidates = ${c.count()}"); c
    }
    time("verifyJaccard") {
      println("[debug]   pairs = " + Dedup.verifyJaccard(cand, sets, 0.8).count())
    }
    spark.stop()
  }
}
