package graft.tools

import org.apache.spark.sql.SparkSession
import graft.fts.{Index, Search}

/** Scratch timing harness for the BM25 path (not part of the driver
  * contract). */
object DebugBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[debug] docs = ${docs.count()}")
    val ix = Index.build(docs)
    time("postings count") { println("[debug]   postings = " + ix.postings.count()) }
    time("doclens count") { println("[debug]   doclens = " + ix.docLens.count()) }
    time("stats collect") { println("[debug]   stats = " + ix.stats.collect().mkString) }
    time("scoreBm25 full") {
      println("[debug]   rows = " + Search.scoreBm25(ix, Seq("spark", "query"), 10).count())
    }
    time("scoreBm25 again") {
      println("[debug]   rows = " + Search.scoreBm25(ix, Seq("spark", "query"), 10).count())
    }
    time("bm25TopK noop write") {
      Search.bm25TopK(docs, Seq("spark", "query"), 10)
        .write.format("noop").mode("overwrite").save()
    }
    time("bm25TopK coalesce1 write") {
      Search.bm25TopK(docs, Seq("spark", "query"), 10)
        .coalesce(1).write.mode("overwrite").parquet("/tmp/bm25_dbg")
    }
    spark.stop()
  }
}
