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
}
