package graft.ops

import graft.SparkSpec

/** SCD type-2 semantics on a hand-computable dimension. */
class ScdSpec extends SparkSpec {

  private def dim0 = {
    import spark.implicits._
    Seq(
      (1L, "east", "2024-01-01", null.asInstanceOf[String], true),
      (2L, "west", "2024-01-01", null.asInstanceOf[String], true)
    ).toDF("k", "region", "valid_from", "valid_to", "is_current")
  }

  test("change closes the current row and opens a new version") {
    import spark.implicits._
    val changes = Seq((1L, "north", "2024-03-01")).toDF("k", "region", "ts")
    val d = Scd.applyChanges(dim0, changes, "k", Seq("region"), "ts")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4)))
    assert(d.toSeq == Seq(
      (1L, "east", "2024-01-01", Some("2024-03-01"), false),
      (1L, "north", "2024-03-01", None, true),
      (2L, "west", "2024-01-01", None, true)))
  }

  test("no-op change, new key insert, latest-per-key collapse") {
    import spark.implicits._
    val changes = Seq(
      (1L, "east", "2024-03-01"),            // equal to current → no-op
      (3L, "south", "2024-03-01"),           // brand-new key
      (2L, "mid", "2024-02-01"),             // superseded within the batch
      (2L, "far", "2024-03-01")              // latest wins
    ).toDF("k", "region", "ts")
    val d = Scd.applyChanges(dim0, changes, "k", Seq("region"), "ts")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)),
        r.getBoolean(4)))
    assert(d.toSeq == Seq(
      (1L, "east", None, true),                       // untouched
      (2L, "west", Some("2024-03-01"), false),        // closed at LATEST ts
      (2L, "far", None, true),                        // 'mid' never landed
      (3L, "south", None, true)))
  }

  test("NULL-valued attribute changes are real changes, both directions") {
    import spark.implicits._
    // value → NULL must open a version (null-unsafe =!= would silently
    // no-op it), and NULL → NULL must stay a no-op
    val toNull = Seq((1L, null.asInstanceOf[String], "2024-03-01"))
      .toDF("k", "region", "ts")
    val d1 = Scd.applyChanges(dim0, toNull, "k", Seq("region"), "ts")
      .localCheckpoint()
    val rows1 = d1.orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(3)),
        r.getBoolean(4)))
    assert(rows1.toSeq == Seq(
      (1L, Some("east"), Some("2024-03-01"), false),
      (1L, None, None, true),
      (2L, Some("west"), None, true)),
      s"value→NULL did not open a version: ${rows1.toSeq}")
    // same NULL again: the current row already carries NULL → no-op
    val again = Seq((1L, null.asInstanceOf[String], "2024-06-01"))
      .toDF("k", "region", "ts")
    val d2 = Scd.applyChanges(d1, again, "k", Seq("region"), "ts")
    assert(d2.count() == 3, "NULL→NULL change must be the SCD no-op")
    // and NULL → value re-opens
    val back = Seq((1L, "north", "2024-09-01")).toDF("k", "region", "ts")
    val d3 = Scd.applyChanges(d2, back, "k", Seq("region"), "ts")
      .filter($"k" === 1L && $"is_current").collect()
    assert(d3.length == 1 && d3.head.getString(1) == "north")
  }

  test("history rows pass through untouched across repeated batches") {
    import spark.implicits._
    val b1 = Seq((1L, "north", "2024-03-01")).toDF("k", "region", "ts")
    val d1 = Scd.applyChanges(dim0, b1, "k", Seq("region"), "ts")
      .localCheckpoint()
    val b2 = Seq((1L, "south", "2024-06-01")).toDF("k", "region", "ts")
    val d2 = Scd.applyChanges(d1, b2, "k", Seq("region"), "ts")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)),
        r.getBoolean(4)))
    assert(d2.toSeq == Seq(
      (1L, "east", Some("2024-03-01"), false),  // immutable history
      (1L, "north", Some("2024-06-01"), false),
      (1L, "south", None, true),
      (2L, "west", None, true)))
  }
}
