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
}
