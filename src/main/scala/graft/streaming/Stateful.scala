package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class UserEvent(user_id: Long, event_type: String, value: Double)
final case class UserState(events: Long, total: Double)
final case class UserSnapshot(user_id: Long, events: Long, total: Double)

/** Custom streaming state via KeyValueGroupedDataset.mapGroupsWithState —
  * the Structured-Streaming successor of the reference's DStream
  * `updateStateByKey` (streaming PairDStreamFunctions.scala:397) /
  * `mapWithState` (:380): state lives in the state store, keyed by group,
  * carried across micro-batches.
  */
object Stateful {

  def updateUser(id: Long, events: Iterator[UserEvent],
                 state: GroupState[UserState]): UserSnapshot = {
    var s = state.getOption.getOrElse(UserState(0L, 0.0))
    events.foreach { e => s = UserState(s.events + 1, s.total + e.value) }
    state.update(s)
    UserSnapshot(id, s.events, s.total)
  }

  /** Running per-user totals over a stream of events; emits one snapshot per
    * user per micro-batch (Update mode). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateUser)
  }

  /** Output mode the query must run with (mapGroupsWithState contract). */
  val outputMode: OutputMode = OutputMode.Update()
}
