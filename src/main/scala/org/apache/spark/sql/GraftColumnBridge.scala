package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters, so graft's
  * native Catalyst expressions can be exposed as `Column`s without a
  * function-registry round-trip (the registry path couples every call site
  * to per-session installation). Standard extension-library pattern: a
  * single accessor object inside the sql package (the reference's own
  * Dataset factory is sql-package-private the same way,
  * sql/core/.../Dataset.scala:54 `private[sql] object Dataset`).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A copy of a file-scan DataFrame with FRESH output exprIds but the SAME
    * underlying relation (file listing is NOT re-done — that cost is why
    * the caller caches). Needed when one query grafts the same cached
    * relation in as several subplans: identical exprIds across join sides
    * make the plan ambiguous (analysis would run DeduplicateRelations;
    * optimizer-injected subplans must do it themselves). */
  def freshCopy(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    df.queryExecution.analyzed match {
      case lr: LogicalRelation =>
        classic.Dataset.ofRows(
          df.sparkSession.asInstanceOf[classic.SparkSession], lr.newInstance())
      case _ => df // not a bare relation: caller gets the original
    }
  }
}
