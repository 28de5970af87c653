package graft.ext

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Z-ORDER (Morton) clustering code — the multi-column data-skipping
  * layout (Delta OPTIMIZE ZORDER BY, Iceberg sort-order z-order): each
  * zone column's value maps to its quantile-rank bucket (binary search
  * over precomputed boundaries — skew-resistant where equal-width
  * bucketing is not), and the bucket codes bit-interleave into one long.
  * Range-clustering files by this code gives EVERY zone column file-level
  * locality (each column's effective resolution is bits/ncols of the
  * code's prefix), where lexicographic multi-column clustering serves
  * only the leading column.
  *
  * Boundaries ship as a plan reference object (they are a per-write
  * constant from approxQuantile — thousands of doubles at most, never
  * data-sized). NULL values code as bucket 0 (sort-first, matching
  * null-first range clustering). One compiled call per row.
  */
object ZOrder {

  /** Bucket of `v` in sorted `bounds` = #boundaries strictly below v. */
  private def bucket(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleaved z-code of the columns' bucket codes, `bits` per column.
    * Total bits = bits·ncols must fit a long (guarded at plan build). */
  def code(vals: Array[Double], nulls: Array[Boolean],
           bounds: Array[Array[Double]], bits: Int): Long = {
    val n = vals.length
    var z = 0L
    var i = 0
    while (i < n) {
      val c = if (nulls(i)) 0 else bucket(vals(i), bounds(i))
      var b = 0
      while (b < bits) {
        if (((c >> b) & 1) == 1) z |= 1L << (b * n + i)
        b += 1
      }
      i += 1
    }
    z
  }
}

/** `z_order_code(c1, c2, …)` over double-cast zone columns, with the
  * per-column quantile boundaries bound at construction.
  *
  * CodegenFallback deliberately: this expression exists only on the
  * WRITE path (one eval per row while clustering, amortized over every
  * pruned read) — never in a query's hot loop — and the enclosing stage
  * still whole-stage-codegens around a fallback expression. The kernel
  * itself ([[ZOrder.code]]) is a static call ready for a doGenCode
  * upgrade if a read path ever wants z-codes. */
case class ZOrderCodeExpr(children: Seq[Expression],
                          boundaries: Seq[Array[Double]], bits: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.nonEmpty && children.size == boundaries.size,
    "one boundary array per zone column")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits per column × columns must fit a long, got $bits × ${children.size}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "z_order_code"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_order_code requires DOUBLE zone columns, got " +
          children.map(_.dataType.catalogString).mkString(", "))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val vals = new Array[Double](n)
    val nulls = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) nulls(i) = true else vals(i) = v.asInstanceOf[Double]
      i += 1
    }
    ZOrder.code(vals, nulls, boundaries.toArray, bits)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCodeExpr =
    copy(children = newChildren)
}
