package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SFT/chat data-prep semantics on a hand-computable conversation set. */
class SftSpec extends SparkSpec {

  /** Two conversations, timestamps deliberately out of arrival order. */
  private lazy val conv = {
    import spark.implicits._
    Seq(
      // conv 1: user/assistant/user — clean alternation
      (1L, 1, "user", "hi"),
      (1L, 2, "assistant", "hello"),
      (1L, 3, "user", "bye"),
      // conv 2: assistant opener + a same-role adjacency + a dup turn
      (2L, 1, "assistant", "hello"),
      (2L, 2, "assistant", "hello"),
      (2L, 3, "user", "hi")
    ).toDF("conv_id", "turn_idx", "role", "content")
  }

  test("conversations: event-time order, deterministic role map") {
    import spark.implicits._
    val events = Seq(
      (10L, 200L, 7L, "error", "{}"),   // later ts but smaller event_id
      (11L, 100L, 7L, "click", "{}"),
      (12L, 100L, 8L, "purchase", "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "props")
    val c = Sft.conversations(events).orderBy("conv_id", "turn_idx").collect()
    assert(c.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((7L, 1, "user"), (7L, 2, "assistant"), (8L, 1, "assistant")))
    assert(c(0).getString(3) == "click {}")
  }

  test("renderTemplate: ordered byte-exact serialization") {
    val r = Sft.renderTemplate(conv).collect()
    val m = r.map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(m(1L) == "<|user|>hi<|assistant|>hello<|user|>bye")
    assert(m(2L) == "<|assistant|>hello<|assistant|>hello<|user|>hi")
    assert(r.find(_.getLong(0) == 1L).get.getLong(3) ==
      m(1L).length.toLong) // n_chars
  }

  test("validate: counts same-role adjacencies and checks the opener") {
    val v = Sft.validateConversations(conv).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(v(1L) == ((0L, true)))
    assert(v(2L) == ((1L, false)))
  }

  test("turnDedup: first (conv, turn) wins across conversations") {
    val d = Sft.turnDedup(conv).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // conv 1 all first occurrences; conv 2 loses both 'hello' copies
    // (first '<assistant, hello>' is conv 1 turn 2) and the 'hi' copy
    assert(d(1L) == ((3L, 0L)))
    assert(d(2L) == ((0L, 3L)))
  }

  test("lossMaskStats: only assistant chars are trainable") {
    val m = Sft.lossMaskStats(conv).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // conv 1: hi(2)+hello(5)+bye(3)=10 total, assistant hello=5
    assert(m(1L) == ((10L, 5L, 0.5)))
    // conv 2: hello+hello+hi = 12 total, assistant 10
    assert(m(2L) == ((12L, 10L, 0.8333)))
  }

  test("truncateToBudget: longest suffix within budget, oldest drop first") {
    // conv 1 lengths: hi=2, hello=5, bye=3 → suffix sums from the end:
    // bye 3, hello+bye 8, hi+hello+bye 10
    def run(budget: Long) = Sft.truncateToBudget(conv, budget).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(run(8L)(1L) == ((2L, 8L)))   // keeps hello+bye
    assert(run(7L)(1L) == ((1L, 3L)))   // only bye fits
    assert(run(0L)(1L) == ((0L, 0L)))
    assert(run(100L)(1L) == ((3L, 10L)))
  }
}
