package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |a ∩ b| over two ASCENDING-sorted `array<bigint>` with no null
  * elements — the wedge-intersection kernel of the triangle count
  * (r06): per oriented edge (a,b) the triangle contribution is
  * |N⁺(a) ∩ N⁺(b)|, and both adjacency lists arrive sorted from
  * `sort_array(collect_list(...))`.
  *
  * Why a native expression (r18, guide §1.2 per-task work): the
  * `size(array_intersect(na, nb))` spelling builds an OpenHashSet per
  * ROW PAIR — one allocation + hash probes per element — only to throw
  * the materialized intersection away for its size. On sorted inputs
  * the same count is a two-pointer merge: O(|a|+|b|), zero allocation,
  * one static call inside whole-stage codegen. Orientation bounds each
  * list at O(√m), so this runs Σ(|N⁺(a)|+|N⁺(b)|) primitive compares
  * per query — the same asymptotics with a hashing-free constant.
  *
  * Set semantics match array_intersect's distinct-element count:
  * duplicate runs advance in both arrays and count once (the r06
  * inputs are sets, so the skip is defensive). Null INPUTS yield NULL
  * (BinaryExpression null-safe contract); null ELEMENTS are the
  * caller's precondition — enforced here with a loud error rather than
  * a silent wrong count.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ASCENDING-SORTED array<bigint> arguments " +
        "(unsorted input returns a silently wrong count — wrap in sort_array), " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCount.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Two-pointer distinct-intersection count over ascending arrays. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null element (caller precondition: non-null sorted arrays)")
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        // advance past duplicate runs so set semantics match array_intersect
        val v = x
        while (i < n && !a.isNullAt(i) && a.getLong(i) == v) i += 1
        while (j < m && !b.isNullAt(j) && b.getLong(j) == v) j += 1
      }
    }
    c
  }
}
