package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction-tuning (SFT/chat) data-prep operators: event streams become
  * role-tagged conversations, which render to training text, validate
  * against the alternation contract, dedup at turn granularity, and
  * truncate to a context budget. The operators mirror what every chat
  * fine-tuning pipeline runs between raw logs and the tokenizer.
  *
  * Scale posture: everything is keyed by conversation (or by turn content
  * for dedup) — windows partition on those keys, so state per task is one
  * conversation (bounded by session length), never corpus-global.
  */
object Sft {

  /** Events → turns: one conversation per user, turns ordered by event
    * time (ties on event_id), role mapped deterministically from the
    * event type (interaction events speak as 'user', system events as
    * 'assistant'), content = the stable `event_type ⧺ props` text (value
    * is a DOUBLE — engines format doubles differently, so it stays out of
    * the content contract). */
  def conversations(events: DataFrame): DataFrame = {
    val role = when(col("event_type").isin("click", "view", "search", "signup"),
      "user").otherwise("assistant")
    events.select(
        col("user_id").as("conv_id"),
        row_number().over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))).as("turn_idx"),
        role.as("role"),
        concat(col("event_type"), lit(" "), col("props")).as("content"))
  }

  /** Render the chat template: per conversation, turns concatenate in
    * order as `<|role|>content` — the serialized training example. The
    * per-conversation collect_list is bounded by the conversation length
    * (a session, not a corpus); array_sort on the (turn_idx,…) struct
    * makes the order explicit rather than an accident of arrival. */
  def renderTemplate(conv: DataFrame): DataFrame =
    conv.groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("role"),
              col("content")))),
            t => concat(lit("<|"), t.getField("role"), lit("|>"),
              t.getField("content"))),
          "").as("rendered"))
      .withColumn("n_chars", length(col("rendered")).cast("long"))
      .orderBy("conv_id")

  /** Alternation audit: chat training contracts want user/assistant
    * strictly alternating and a 'user' opener. Per conversation: turn
    * count, number of same-role adjacencies (each is a merge-or-drop
    * decision downstream), and whether the opener is 'user'. One lag
    * window partitioned by conversation. */
  def validateConversations(conv: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("same_role_adjacencies"),
        max(when(col("turn_idx") === 1, col("role"))).as("opener"))
      .withColumn("starts_with_user", col("opener") === "user")
      .drop("opener")
      .orderBy("conv_id")
  }

  /** TURN-level exact dedup across conversations (the SFT analogue of
    * line-level corpus dedup): identical (role, content) turns collapse
    * to their first occurrence in (conv_id, turn_idx) order; every later
    * copy is template boilerplate by definition. Per conversation: kept
    * vs dropped counts. One rank window keyed by the turn content —
    * hash-partitioned by content, so a hot duplicate turn is one key's
    * partition, never a driver-side set. */
  def turnDedup(conv: DataFrame): DataFrame = {
    val first = row_number().over(Window.partitionBy("role", "content")
      .orderBy("conv_id", "turn_idx"))
    conv.withColumn("keep", first === 1)
      .groupBy("conv_id")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("dropped"))
      .orderBy("conv_id")
  }

  /** LOSS-MASK accounting (SFT trains on assistant tokens only — user
    * turns are context, their loss is masked): per conversation, total
    * content vs trainable (assistant) content and the trainable ratio —
    * the number that decides whether a conversation is worth its context
    * window. One aggregation, exact integer char counts, ratio rounded. */
  def lossMaskStats(conv: DataFrame): DataFrame =
    conv.groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        sum(length(col("content")).cast("long")).as("chars_total"),
        sum(when(col("role") === "assistant",
          length(col("content")).cast("long")).otherwise(0L))
          .as("chars_trainable"))
      .withColumn("trainable_ratio",
        // rational ratio → floor-form rounding (core.Num.roundHalfUp)
        graft.core.Num.roundHalfUp(col("chars_trainable").cast("double") /
          col("chars_total").cast("double"), 4))
      .orderBy("conv_id")

  /** Context-budget truncation: keep the longest SUFFIX of turns whose
    * total content length fits `budget` chars — chat context windows drop
    * the oldest turns first. Reverse cumulative sum per conversation;
    * exact integer arithmetic. */
  def truncateToBudget(conv: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val w = Window.partitionBy("conv_id").orderBy(col("turn_idx").desc)
    conv
      .withColumn("cum", sum(length(col("content")).cast("long")).over(w))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("turns_kept"),
        sum(when(col("cum") <= budget, length(col("content")).cast("long"))
          .otherwise(0L)).as("chars_kept"))
      .withColumn("turns_dropped", col("n_turns") - col("turns_kept"))
      .orderBy("conv_id")
  }
}
