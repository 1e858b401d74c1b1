package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sparse-vector dot product — the `gp_sparse_vector` (svec) analog
  * (reference `gpcontrib/gp_sparse_vector/operators.c` svec_svec_dot_product:
  * a single pass over two compressed representations without
  * densification). The svec type run-length-encodes repeated values;
  * the equivalent Spark-native encoding is a sorted
  * `array<struct<i:int, v:double>>` of (index, value) pairs — zeros
  * simply absent — and the dot is a two-pointer merge over the two
  * sorted index lists: O(nnz_a + nnz_b), never O(dimension).
  *
  * Accumulation is in ascending-index order, so the result is
  * deterministic across partitionings. Null semantics match [[VecDot]]:
  * a null entry struct yields NULL. Codegen is one static call inside
  * whole-stage codegen — same kernel discipline as VecDot/StrHash.
  *
  * At 100 TB the posting-list (long-format) join is the shuffle-side
  * encoding of the same data (t10); this kernel is the row-side
  * evaluator once the per-entity vectors are materialized.
  */
case class SvecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "svec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SvecDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = ctx.freshName("svecRes")
      s"""
        java.lang.Double $t = graft.functions.SvecDot.dot($a, $b);
        if ($t == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $t.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SvecDot =
    copy(left = newLeft, right = newRight)
}

object SvecDot {
  /** Two-pointer merge dot over sorted (index, value) entry arrays. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var ia = 0
    var ib = 0
    var acc = 0.0
    while (ia < na && ib < nb) {
      if (a.isNullAt(ia) || b.isNullAt(ib)) return null
      val ra = a.getStruct(ia, 2)
      val rb = b.getStruct(ib, 2)
      val ka = ra.getInt(0)
      val kb = rb.getInt(0)
      if (ka == kb) {
        acc += ra.getDouble(1) * rb.getDouble(1)
        ia += 1; ib += 1
      } else if (ka < kb) ia += 1
      else ib += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
