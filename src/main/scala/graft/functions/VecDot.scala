package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product over `array<float>` embeddings, accumulated in double
  * left-to-right — the similarity kernel (norms are `sqrt(vec_dot(x,x))`,
  * cosine composes from three dots, all in the SAME accumulation order
  * as the previous `aggregate(zip_with(...))` formulation, so the DuckDB
  * oracle still reproduces results bit-for-bit before rounding).
  *
  * Why a native expression: Spark's higher-order functions
  * (aggregate/zip_with) are CodegenFallback — every element bounces
  * through an interpreted lambda with boxing. This is one static call
  * inside whole-stage codegen with a primitive float loop: the brute
  * force s01/s06 scans are exactly the kind of 100 TB hot path where a
  * per-element interpreted lambda is the bottleneck. (Reference analog:
  * vector ops ship as C kernels, not per-element SQL — the same split.)
  *
  * Null semantics match the HOF formulation they replaced: a length
  * mismatch or a null element yields NULL (zip_with pads the shorter
  * side with null, null poisons the sum) — a visible null, never a
  * silently truncated dot, if embedding widths ever diverge.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = ctx.freshName("dotRes")
      s"""
        java.lang.Double $t = graft.functions.VecDot.dot($a, $b);
        if ($t == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $t.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** acc += a[i]*b[i] in doubles, left to right — identical order and
    * precision to `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`;
    * null (not a truncated sum) on length mismatch or null element. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Σ (a[i]-b[i])² in doubles, left to right — the IVF assignment
    * distance, same order and null semantics as the zip_with form. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Integer dot over int8-quantized vectors (array<int>), accumulated
    * in long — s06's quantized kernel. Same null semantics. */
  def doti(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Sign-projection LSH bucket: Σ_p 2^p·[Σ_j emb[j]·w(p,j) > 0] with
    * the deterministic pseudo-random weights w(p,j) = (p·37 + j·17) mod
    * 13 − 6 (j 0-based) — bit-identical to the HOF formulation it
    * replaces (`aggregate(sequence(0, planes-1), ... aggregate(
    * sequence(1, size(emb)), ...))`): each plane dot accumulates
    * left-to-right in double, and a NULL element null-poisons every
    * plane dot, whose `NULL > 0` CASE then contributes 0 — so the
    * bucket of a null-holed vector is 0, exactly as the HOF computed. */
  def signBucket(a: ArrayData, planes: Int): Long = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return 0L; i += 1 }
    var acc = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += a.getFloat(j).toDouble * ((p * 37 + j * 17) % 13 - 6).toDouble
        j += 1
      }
      if (dot > 0.0) acc += 1L << p
      p += 1
    }
    acc
  }
}

/** Sign-projection LSH bucket over `array<float>` — the s02/s03/s09/s13
  * bucketing kernel (see [[VecDot]] for the native-vs-HOF rationale:
  * the 16-plane × 64-dim projection was the s03 dissection's dominant
  * term at 0.62 s of 0.83 — PROF_r16). `right` is the plane count (a
  * foldable small int; 2^planes buckets). Declares its input types
  * (the VecDotInt convention — the kernel reads 4-byte float slots).
  * NULL contract: like every kernel in this file the expression is
  * null-intolerant (NULL in → NULL out); the HOF it replaced bucketed
  * a NULL embedding to 0 (size(NULL) → NULL inner dot → `NULL > 0`
  * CASE → 0 per plane — and the DuckDB oracle's generate_series
  * spelling still computes that), so the derivation site
  * (Similarity.bucketedDf) restores it with an explicit
  * `CASE WHEN embedding IS NULL THEN 0` — the divergence is visible
  * SQL, not a hidden kernel default. */
case class VecSignBucket(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_signbucket expects (array<float>, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_signbucket"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecDot.signBucket(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) =>
      s"${ev.value} = graft.functions.VecDot.signBucket($a, $p);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSignBucket =
    copy(left = newLeft, right = newRight)
}

/** Σ (a[i]-b[i])² over `array<float>` — see [[VecDot]] for rationale. */
case class VecL2Sq(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2sq"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecDot.l2sq(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = ctx.freshName("l2Res")
      s"""
        java.lang.Double $t = graft.functions.VecDot.l2sq($a, $b);
        if ($t == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $t.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Integer dot over `array<int>` (int8-quantized) — see [[VecDot]].
  * Declares its input types: the kernel reads 4-byte slots, so a
  * `array<bigint>` argument must fail analysis, not read garbage. */
case class VecDotInt(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_doti expects (array<int>, array<int>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_doti"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecDot.doti(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = ctx.freshName("dotiRes")
      s"""
        java.lang.Long $t = graft.functions.VecDot.doti($a, $b);
        if ($t == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $t.longValue(); }
      """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotInt =
    copy(left = newLeft, right = newRight)
}
