package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming sketch maintenance: the count-min grid ([[graft.ops.Cms]]) is
  * MERGEABLE — counter addition — which is the property that makes
  * sketches the scale tool: every executor (here, every micro-batch)
  * sketches its slice independently and the grids ADD. The store is one
  * ≤ d·w-row parquet, folded per batch; at 1000 executors the same fold
  * is a tree-reduce of 192-counter grids, never a data shuffle. */
object StreamSketch {

  /** Ingest `stream` and maintain the additive CMS store at `store`.
    * Each micro-batch: sketch the batch (one explode+groupBy over the
    * BATCH only), add to the running grid, rewrite the store. The merged
    * grid materializes through a driver collect that is BOUNDED at d·w
    * rows by construction — coordinator-scale state, loudly capped. */
  def start(stream: DataFrame, keyCol: String, store: String,
            d: Int, w: Int): StreamingQuery = {
    require(d.toLong * w <= (1 << 20), s"sketch grid ${d}x$w too large to fold on the driver")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val delta = graft.ops.Cms.sketch(batch, keyCol, d, w)
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(store)))
            spark.read.parquet(store).unionByName(delta)
              .groupBy("r", "pos").agg(sum(col("cnt")).as("cnt"))
          else delta
        // read-then-overwrite of the same path needs a materialization
        // barrier; the grid is ≤ d·w rows, so the driver IS the barrier
        val rows = merged.collect().toSeq
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), merged.schema)
          .write.mode("overwrite").parquet(store)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()
  }

  def read(spark: org.apache.spark.sql.SparkSession, store: String): DataFrame =
    spark.read.parquet(store)
}
