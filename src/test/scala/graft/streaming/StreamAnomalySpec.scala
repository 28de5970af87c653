package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** StreamAnomaly: the monitor flags an engineered spike and replaying a
  * batch's delta is a no-op (exactly-once under micro-batch replay). */
class StreamAnomalySpec extends SparkSpec {

  test("read flags a spike against the rolling window; replay is a no-op") {
    import spark.implicits._
    val store = graft.core.Scratch.dir("anomaly_spec")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store), true)
    // per-batch counts for key 'a': 10, 11, 9, 40 — the last z-scores
    // (40 − 10) / 1 = 30 against the 3-batch window
    val counts = Seq(0 -> 10, 1 -> 11, 2 -> 9, 3 -> 40)
    counts.foreach { case (bid, n) =>
      (1 to n).map(i => ("a", i)).toDF("key", "i")
        .groupBy("key").agg(count(lit(1)).as("n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=$bid")
    }
    val out = StreamAnomaly.read(spark, store, lookback = 3).collect()
    assert(out.length == 1, s"only bid 3 has a full window: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("bid") == 3L && r.getAs[Long]("n") == 40L)
    assert(r.getAs[Double]("mean_prev") == 10.0)
    assert(r.getAs[Double]("sd_prev") == 1.0)
    assert(r.getAs[Double]("z") == 30.0)
    assert(r.getAs[Boolean]("is_anomaly"))
    // replay: rewriting bid=2 with the same content changes nothing
    (1 to 9).map(i => ("a", i)).toDF("key", "i")
      .groupBy("key").agg(count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=2")
    val again = StreamAnomaly.read(spark, store, lookback = 3).collect()
    assert(again.length == 1 && again.head.getAs[Double]("z") == 30.0)
  }

  test("flat history (sd = 0) and short history stay unscored") {
    import spark.implicits._
    val store = graft.core.Scratch.dir("anomaly_spec_flat")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store), true)
    (0 to 3).foreach { bid =>
      (1 to 5).map(i => ("b", i)).toDF("key", "i")
        .groupBy("key").agg(count(lit(1)).as("n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$store/bid=$bid")
    }
    assert(StreamAnomaly.read(spark, store, lookback = 3).count() == 0)
  }
}
