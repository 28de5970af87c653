package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class UserEvent(user_id: Long, event_type: String, value: Double)
final case class UserState(events: Long, total: Double)
final case class UserSnapshot(user_id: Long, events: Long, total: Double)

/** Order-independent per-user state (count + max): every fold order over
  * the same events yields bit-identical results, so a snapshot can be
  * hash-compared against a batch oracle — double SUMS cannot (addition
  * order varies with partitioning). */
final case class UserMaxState(events: Long, maxValue: Double)
final case class UserActivity(user_id: Long, events: Long, max_value: Double)

/** One event mapped to its hourly bucket (epoch hours). */
final case class HourObs(user_id: Long, hour: Long, value: Double)
/** Gap-fill carry state: the key's last observed bucket and value. */
final case class FillState(lastHour: Long, lastValue: Double)
/** One grid row: observed (filled=false) or carried forward (true). */
final case class FilledHour(user_id: Long, hour: Long, value: Double,
                            filled: Boolean)

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

  /** flatMapGroupsWithState flavour: zero-or-one rows per group per batch —
    * a snapshot is emitted only once a user's running total crosses
    * `threshold` (selective emission is what flatMap adds over mapGroups;
    * the reference's closest analogue is mapWithState's optional emit,
    * PairDStreamFunctions.scala:380). */
  def updateUserIfHot(threshold: Double)(
      id: Long, events: Iterator[UserEvent],
      state: GroupState[UserState]): Iterator[UserSnapshot] = {
    val before = state.getOption.getOrElse(UserState(0L, 0.0))
    var s = before
    events.foreach { e => s = UserState(s.events + 1, s.total + e.value) }
    state.update(s)
    if (s.total >= threshold && before.total < threshold)
      Iterator.single(UserSnapshot(id, s.events, s.total))
    else Iterator.empty
  }

  /** Users whose cumulative value first crossed `threshold` this batch. */
  def hotUsers(events: Dataset[UserEvent], threshold: Double): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateUserIfHot(threshold))
  }

  /** STREAMING GAP FILL (the stateful dual of [[graft.ops.GapFill]]):
    * per-key LOCF over an hourly grid, carried ACROSS micro-batches —
    * when a new bucket arrives, every empty hour since the key's last
    * observed bucket is emitted with the carried value and `filled =
    * true`. Requires event-time-ordered arrival with batch splits on
    * bucket boundaries (the staging contract of the verification query);
    * per-bucket sums run in exact 2-dp BigDecimal (the DECIMAL
    * convention double sums can't replay). Every (key, bucket) row is
    * emitted exactly once, so Append mode is correct; state is ONE
    * (hour, value) pair per key regardless of history length. */
  def fillUserHours(id: Long, rows: Iterator[HourObs],
                    state: GroupState[FillState]): Iterator[FilledHour] = {
    val sums = scala.collection.mutable.TreeMap.empty[Long, BigDecimal]
    rows.foreach { r =>
      val bd = BigDecimal.valueOf(r.value).setScale(2,
        scala.math.BigDecimal.RoundingMode.HALF_UP)
      sums(r.hour) = sums.getOrElse(r.hour, BigDecimal(0)) + bd
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[FilledHour]
    var st = state.getOption
    for ((h, v) <- sums) {
      st.foreach { s =>
        var g = s.lastHour + 1
        while (g < h) { out += FilledHour(id, g, s.lastValue, filled = true); g += 1 }
      }
      val dv = v.toDouble
      out += FilledHour(id, h, dv, filled = false)
      st = Some(FillState(h, dv))
    }
    st.foreach(state.update)
    out.iterator
  }

  /** [[fillUserHours]] over a keyed stream. */
  def gapFillHours(obs: Dataset[HourObs]): Dataset[FilledHour] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        fillUserHours)
  }

  def updateActivity(id: Long, events: Iterator[UserEvent],
                     state: GroupState[UserMaxState]): UserActivity = {
    var s = state.getOption.getOrElse(UserMaxState(0L, Double.NegativeInfinity))
    events.foreach { e =>
      s = UserMaxState(s.events + 1, math.max(s.maxValue, e.value))
    }
    state.update(s)
    UserActivity(id, s.events, s.maxValue)
  }

  /** Per-user running (count, max) — the oracle-comparable stateful shape
    * (see [[UserMaxState]]). Update mode, like [[runningUserTotals]]. */
  def runningActivity(events: Dataset[UserEvent]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateActivity)
  }

  /** The same running (count, max) through `transformWithState` — the
    * Spark-4 arbitrary-state API v2 (successor of mapGroupsWithState;
    * typed named-state handles, timers, TTL). State is a single
    * [[UserMaxState]] ValueState per user; one snapshot per touched user
    * per batch, Update-mode, so the same monotone-fold read-back as
    * [[runningActivity]] applies. Requires the RocksDB state store
    * provider (the API's contract — also the provider a 100 TB deployment
    * runs, for state larger than executor heap + changelog checkpointing).
    */
  final class ActivityProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, UserActivity] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[UserMaxState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[UserMaxState]("activity",
        org.apache.spark.sql.Encoders.product[UserMaxState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserActivity] = {
      var s = Option(st.get()).getOrElse(UserMaxState(0L, Double.NegativeInfinity))
      rows.foreach { e =>
        s = UserMaxState(s.events + 1, math.max(s.maxValue, e.value))
      }
      st.update(s)
      Iterator.single(UserActivity(key, s.events, s.maxValue))
    }
  }

  def runningActivityTws(events: Dataset[UserEvent]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ActivityProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }
}
