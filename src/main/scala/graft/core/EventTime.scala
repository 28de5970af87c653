package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Schema-dispatching normalization of the events fixture's `ts` column.
  *
  * The fixture has shipped `ts` in two vintages: INT64 TIMESTAMP(NANOS)
  * (which Spark 4 reads as BIGINT epoch-nanos under
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS) with
  * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ). Sessions run
  * with `spark.sql.session.timeZone=UTC` ([[GraftSession]]), so the NTZ
  * wall-clock IS the instant and a plain cast to TIMESTAMP is lossless and
  * matches what DuckDB sees reading the same file. Every event-time consumer
  * (streaming watermarks/windows, as-of, range join) dispatches through
  * these helpers so a future fixture vintage changes exactly one place —
  * never integer arithmetic inlined at the use site.
  */
object EventTime {

  private def unsupported(tsCol: String, dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"unsupported event-time type for `$tsCol`: $dt " +
        "(expected BIGINT epoch-nanos, TIMESTAMP, or TIMESTAMP_NTZ)")

  /** `ts` normalized to TimestampType (a real instant; session tz is UTC).
    * Use for watermarks, `window`/`session_window`, and interval math. */
  def toTimestamp(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        // epoch-nanos vintage: integer-divide to micros — a double
        // division would lose precision at 1.7e18
        df.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` DIV 1000")))
      case TimestampNTZType => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => df
      case dt => unsupported(tsCol, dt)
    }

  /** `ts` normalized to BIGINT epoch-micros — for operators that bucket or
    * compare times as longs (range-join bucketing, as-of union ordering). */
  def toMicros(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => df.withColumn(tsCol, expr(s"`$tsCol` DIV 1000"))
      case TimestampNTZType | TimestampType =>
        df.withColumn(tsCol, unix_micros(col(tsCol).cast(TimestampType)))
      case dt => unsupported(tsCol, dt)
    }
}
