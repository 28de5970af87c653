package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), UTC session time zone (oracle parity), shuffle partitions
  * sized for the local harness but overridable for cluster deploys.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Apply graft settings to an existing session (used by Verify/Bench whose
    * sessions are driver-owned). Safe to call repeatedly.
    *
    * `nanosAsLong`: the events fixture stores ts as INT64 TIMESTAMP(NANOS),
    * which Spark 4 rejects by default; with this flag it reads as BIGINT
    * nanos and we convert explicitly where event-time is needed. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
