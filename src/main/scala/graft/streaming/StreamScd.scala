package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING DIMENSION MAINTENANCE: change batches arrive as a stream and
  * fold into a versioned SCD-type-2 dimension ([[graft.ops.Scd]]) — the
  * operational-feed-to-warehouse loop run continuously. Each micro-batch
  * rewrites the dimension into a fresh epoch directory and flips a
  * pointer file; readers see a consistent epoch, and a crash between
  * write and flip leaves the previous epoch intact (the FTS delta-log's
  * epoch-flip idempotence applied to a dimension).
  *
  * Cost per batch is the current slice + the batch (history rows pass
  * through — at warehouse scale the rewrite would additionally partition
  * by is_current so history files are copied by reference; here the
  * epoch write makes the lifecycle observable and crash-safe). */
object StreamScd {

  private def pointer(store: String) = s"$store/_current_epoch"

  def readDim(spark: org.apache.spark.sql.SparkSession,
              store: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(pointer(store))
    val epoch = scala.util.Using.resource(fs.open(p)) { in =>
      new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim
    }
    spark.read.parquet(s"$store/epoch_$epoch")
  }

  /** Start folding the change stream into the dimension at `store`,
    * seeding from `initial` on the first batch. */
  def start(changes: DataFrame, initial: DataFrame, store: String,
            keyCol: String, attrCols: Seq[String],
            tsCol: String): StreamingQuery = {
    val spark = initial.sparkSession
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val dim =
          if (fs.exists(new org.apache.hadoop.fs.Path(pointer(store))))
            readDim(spark, store)
          else initial
        graft.ops.Scd.applyChanges(dim, batch, keyCol, attrCols, tsCol)
          .write.mode("overwrite").parquet(s"$store/epoch_$id")
        // flip AFTER the epoch lands: readers never see a partial write
        scala.util.Using.resource(fs.create(
          new org.apache.hadoop.fs.Path(pointer(store)), true)) { out =>
          out.write(id.toString.getBytes("UTF-8"))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$store-ckpt")
      .start()
  }
}
