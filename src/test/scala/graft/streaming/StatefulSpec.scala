package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** mapGroupsWithState carries state across micro-batches (the reference's
  * updateStateByKey capability on the modern engine). */
class StatefulSpec extends SparkSpec {

  test("state accumulates across two micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext

    val input = MemoryStream[UserEvent]
    val q = Stateful.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("stateful_sink")
      .outputMode(Stateful.outputMode)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    input.addData(UserEvent(1L, "click", 1.0), UserEvent(1L, "view", 2.0),
      UserEvent(2L, "click", 5.0))
    q.processAllAvailable()
    input.addData(UserEvent(1L, "purchase", 10.0))
    q.processAllAvailable()
    q.stop()

    // Update mode: latest snapshot per user reflects ALL batches
    val rows = spark.table("stateful_sink")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("events").as("events"),
        org.apache.spark.sql.functions.max("total").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 3L, 13.0), (2L, 1L, 5.0)))
  }

  test("gapFillHours carries LOCF state across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext

    val input = MemoryStream[HourObs]
    val q = Stateful.gapFillHours(input.toDS())
      .writeStream.format("memory").queryName("gapfill_sink")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // batch 0: user 1 observed at hours 10 and 12 (gap at 11, same batch);
    // two events in hour 10 must sum exactly
    input.addData(HourObs(1L, 10L, 1.25), HourObs(1L, 10L, 2.50),
      HourObs(1L, 12L, 7.0))
    q.processAllAvailable()
    // batch 1: next observation at hour 15 — gaps 13, 14 must be emitted
    // HERE from the state carried out of batch 0
    input.addData(HourObs(1L, 15L, 9.0), HourObs(2L, 3L, 4.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("gapfill_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(rows == Set(
      (1L, 10L, 3.75, false), (1L, 11L, 3.75, true), (1L, 12L, 7.0, false),
      (1L, 13L, 7.0, true), (1L, 14L, 7.0, true), (1L, 15L, 9.0, false),
      (2L, 3L, 4.0, false)), rows.toString)
  }

  test("flatMapGroupsWithState emits only on threshold crossing") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext

    val input = MemoryStream[UserEvent]
    val q = Stateful.hotUsers(input.toDS(), threshold = 10.0)
      .writeStream.format("memory").queryName("hot_sink")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // batch 1: user 1 at 6.0 (below), user 2 at 12.0 (crosses) → only user 2
    input.addData(UserEvent(1L, "click", 6.0), UserEvent(2L, "click", 12.0))
    q.processAllAvailable()
    // batch 2: user 1 crosses (6+5=11); user 2 already above → no re-emit
    input.addData(UserEvent(1L, "view", 5.0), UserEvent(2L, "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("hot_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((2L, 1L, 12.0), (1L, 2L, 11.0)),
      s"exactly one crossing emission per user, got $rows")
  }
}
