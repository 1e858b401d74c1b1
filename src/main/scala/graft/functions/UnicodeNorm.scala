package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `normalize(text, form)` — Unicode normalization, PG15's SQL-standard
  * NORMALIZE function (reference `src/backend/utils/adt/unicode_norm.c`,
  * unicode_normalize_func; forms NFC/NFD/NFKC/NFKD from UAX #15, a
  * public spec). The JDK's `java.text.Normalizer` implements the same
  * UAX #15 algorithm over the same Unicode character database, so this
  * is a thin native Catalyst expression: `doGenCode` emits a static
  * call that runs inside whole-stage codegen — no UDF wrapper, null-safe
  * via the BinaryExpression contract.
  *
  * 100 TB note: normalization is a pure per-row map — no shuffle, no
  * state; the cost is one NFC quick-check pass per string (the common
  * already-normalized case short-circuits inside the JDK).
  */
case class UnicodeNorm(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(s: Any, f: Any): Any =
    UnicodeNorm.norm(s.asInstanceOf[UTF8String], f.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f) => s"graft.functions.UnicodeNorm.norm($s, $f)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UnicodeNorm =
    copy(left = newLeft, right = newRight)
}

object UnicodeNorm {
  def norm(s: UTF8String, form: UTF8String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form.toString.toUpperCase)
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString, f))
  }
}
