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

  /** STREAMING WEIGHTED RESERVOIR (Efraimidis & Spirakis A-ES is *the*
    * one-pass weighted sampler — the key −ln(u)/w is per-row state, so
    * "keep the n smallest keys" merges across batches exactly like the
    * CMS grid adds): each micro-batch computes its rows' keys, unions
    * with the held reservoir, and keeps the n smallest. The store is n
    * rows; the final reservoir over any batch split equals the one-shot
    * batch draw, which is what lets a 1000-executor ingest sample without
    * coordination. `keyExpr` must be the deterministic A-ES key
    * ([[graft.pipeline.Sampling.weightedSample]]'s md5 construction). */
  def startWeightedReservoir(stream: DataFrame, idCol: String,
                             weightCol: String, seed: String, n: Int,
                             store: String): StreamingQuery = {
    require(n >= 1 && n <= (1 << 20), "reservoir size out of driver range")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val u = (conv(substring(md5(concat(col(idCol).cast("string"),
          lit(":" + seed))), 1, 6), 16, 10).cast("double") + 1.0) /
          (1 << 24).toDouble
        val delta = batch.select(col(idCol).as("rid"),
          round(-log(u) / col(weightCol).cast("double"), 9).as("skey"))
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(store)))
            spark.read.parquet(store).unionByName(delta)
          else delta
        val kept = merged.orderBy(col("skey"), col("rid")).limit(n)
          .collect().toSeq // bounded: n reservoir rows
        spark.createDataFrame(
            spark.sparkContext.parallelize(kept, 1),
            merged.schema)
          .write.mode("overwrite").parquet(store)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()
  }
}
