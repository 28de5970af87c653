package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** STREAMING CEP — the stateful twin of q_temporal_cep's batch pattern
  * (A followed by B within T with NO C between, Flink CEP's
  * notFollowedBy) as a real `flatMapGroupsWithState` state machine: per
  * user the state is two running timestamps (last A, last C); each
  * micro-batch folds its events in (ts, event_id) order, emits the
  * qualifying B events, and the state CROSSES batch boundaries — a click
  * in batch 0 qualifies a purchase in batch 1, which is exactly what the
  * windowed batch form cannot see incrementally.
  *
  * Determinism: micro-batches are staged time-split (all of batch k
  * precedes batch k+1 in event time) and each batch's group iterator is
  * sorted before folding, so the streamed output equals the one-shot
  * batch computation row-for-row — q_temporal_cep's oracle replays it.
  * Matches are landed as per-batch delta dirs (`out/bid=`), the
  * replay-idempotent store convention.
  *
  * Scale: state is two longs per ACTIVE user (the keyed state store,
  * RocksDB-backed in production); per batch each user folds only its
  * own events. A production deployment adds a state TTL
  * (GroupStateTimeout) to retire idle users — elided here because the
  * oracle replays unbounded history.
  */
/** (lastClickTs, lastErrorTs), Long.MinValue = unset. Top-level: the
  * GroupState encoder's generated code instantiates it reflectively. */
case class CepState(lastClick: Long, lastError: Long)

object StreamCep {

  /** Run the pattern over `stream` (event_id, user_id, event_type, ts —
    * ts in epoch micros) and land qualifying purchases under `out`. */
  def start(stream: DataFrame, out: String, windowUs: Long,
            a: String = "click", b: String = "purchase",
            not: String = "error"): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, Long, String, Long)] = stream
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type").cast("string"), col("ts").cast("long"))
      .as[(Long, Long, String, Long)]
    val matches = typed
      .groupByKey(_._2)
      .flatMapGroupsWithState[CepState, (Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, events, state: GroupState[CepState]) =>
          var st = state.getOption.getOrElse(
            CepState(Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          events.toSeq.sortBy(e => (e._4, e._1)).foreach {
            case (eid, uid, typ, ts) =>
              // strict past: qualify BEFORE folding the current event
              if (typ == b && st.lastClick != Long.MinValue &&
                ts - st.lastClick <= windowUs &&
                (st.lastError == Long.MinValue ||
                  st.lastError < st.lastClick)) {
                out += ((eid, uid, (ts - st.lastClick) / 1000000L))
              }
              if (typ == a) st = st.copy(lastClick = ts)
              else if (typ == not) st = st.copy(lastError = ts)
          }
          state.update(st)
          out.iterator
      }
      .toDF("event_id", "user_id", "gap_sec")
    matches.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        batch.coalesce(1).write.mode("overwrite").parquet(s"$out/bid=$bid")
        ()
      }
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$out-ckpt")
      .start()
  }

  /** All matches so far, in the deterministic (event_id) order. */
  def read(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out)
      .select("event_id", "user_id", "gap_sec")
      .orderBy("event_id")
}
