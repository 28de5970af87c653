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

  /** Hive catalog support with a PER-JVM IN-MEMORY Derby metastore. The
    * classic single-JVM blocker — Derby's file-based metastore_db takes an
    * exclusive boot lock, so two concurrent JVMs (harness verify + bench)
    * die on db.lck — disappears when the metastore lives in JVM memory:
    * each process gets its own `jdbc:derby:memory:` database and its own
    * warehouse dir, nothing on disk is shared. The metastore is ephemeral
    * by design: Hive TABLES created by a query live for that JVM's
    * lifetime, which is exactly the harness contract (every query builds
    * its own state), while a production deploy would point
    * `javax.jdo.option.ConnectionURL` at a real metastore service
    * instead. */
  def localHive(b: SparkSession.Builder): SparkSession.Builder = {
    val pid = ProcessHandle.current().pid()
    b.config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:memory:graft_metastore_$pid;create=true")
      .config("spark.sql.warehouse.dir", s"target/graft-hive-wh-$pid")
      .enableHiveSupport()
  }

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
