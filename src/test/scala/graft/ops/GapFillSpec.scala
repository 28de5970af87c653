package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GapFillSpec extends SparkSpec {

  test("fillForward: regular grid per key, LOCF through gaps, filled flags") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", 2.0),
      (1L, "2024-01-01 00:40:00", 3.0),  // same hour → aggregates with the 2.0
      (1L, "2024-01-01 03:15:00", 7.0),  // hours 1 and 2 are gaps
      (2L, "2024-01-01 05:05:00", 1.5)   // single observation: 1-row grid
    ).toDF("user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = GapFill.fillForward(ev, "user_id", "ts",
        round(sum(col("value")), 2), unit = "hour")
      .orderBy("user_id", "bucket")
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).toString,
        x.getDouble(2), x.getBoolean(3))).toList
    assert(r == List(
      (1L, "2024-01-01 00:00:00.0", 5.0, false),
      (1L, "2024-01-01 01:00:00.0", 5.0, true),   // carried forward
      (1L, "2024-01-01 02:00:00.0", 5.0, true),
      (1L, "2024-01-01 03:00:00.0", 7.0, false),
      (2L, "2024-01-01 05:00:00.0", 1.5, false)), r.toString)
    intercept[IllegalArgumentException](
      GapFill.fillForward(ev, "user_id", "ts", sum(col("value")), "fortnight"))
  }

  test("fillLinear interpolates interior gaps on the straight line") {
    import spark.implicits._
    // key 1: observations 4.0 @ 00:00 and 10.0 @ 03:00 → the two gap
    // hours take 6.0 and 8.0 (thirds of the span)
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 4.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 03:20:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 1.5)
    ).toDF("user_id", "ts", "value")
    val r = GapFill.fillLinear(ev, "user_id", "ts",
        round(sum(col("value")), 2), unit = "hour")
      .orderBy("user_id", "bucket")
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).toString,
        x.getDouble(2), x.getBoolean(3))).toList
    assert(r == List(
      (1L, "2024-01-01 00:00:00.0", 4.0, false),
      (1L, "2024-01-01 01:00:00.0", 6.0, true),
      (1L, "2024-01-01 02:00:00.0", 8.0, true),
      (1L, "2024-01-01 03:00:00.0", 10.0, false),
      (2L, "2024-01-01 05:00:00.0", 1.5, false)), r.toString)
    // half-gap boundary: 4.0 → 5.0 over 2h puts the midpoint at 4.5
    // exactly — the floor-form rounding must keep it stable
    val ev2 = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 4.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 5.0)
    ).toDF("user_id", "ts", "value")
    val mid = GapFill.fillLinear(ev2, "user_id", "ts",
        round(sum(col("value")), 2), unit = "hour")
      .orderBy("bucket").collect()(1).getDouble(2)
    assert(mid == 4.5, s"midpoint: $mid")
  }
}
