package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL `to_char(numeric, template)` — the numeric-template subset
  * of the reference's formatting engine (`src/backend/utils/adt/
  * formatting.c`): digit positions `9` (blank-padded) and `0`
  * (zero-padded), decimal point `.`, group separator `,`, and the `FM`
  * (fill-mode) prefix that suppresses padding.
  *
  * A native Catalyst expression, not a UDF: `doGenCode` emits a direct
  * static call, so the operator stays inside whole-stage codegen — no
  * boxing, no closure serialization, scales per-row on the executor.
  */
case class PgToChar(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "pg_to_char"

  override protected def nullSafeEval(num: Any, fmt: Any): Any =
    UTF8String.fromString(
      PgToChar.format(num.asInstanceOf[Double], fmt.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, f) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgToChar.format($n, $f.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgToChar =
    copy(left = newLeft, right = newRight)
}

object PgToChar {
  /** Render `value` through a PG numeric template. Rounding is half-up on
    * the decimal value (PG numeric rounding), independent of the JVM's
    * double-to-string behavior. */
  def format(value: Double, template: String): String = {
    val fm = template.startsWith("FM")
    val tpl = if (fm) template.substring(2) else template
    val dot = tpl.indexOf('.')
    val intTpl = if (dot >= 0) tpl.substring(0, dot) else tpl
    val decTpl = if (dot >= 0) tpl.substring(dot + 1) else ""
    val decDigits = decTpl.count(c => c == '9' || c == '0')

    val bd = java.math.BigDecimal.valueOf(value)
      .setScale(decDigits, java.math.RoundingMode.HALF_UP)
    val negative = bd.signum() < 0
    val unscaled = bd.abs().toPlainString
    val (ip, dp) = unscaled.indexOf('.') match {
      case -1 => (unscaled, "")
      case i  => (unscaled.substring(0, i), unscaled.substring(i + 1))
    }

    // lay digits right-to-left into the integer template
    val sb = new StringBuilder
    var di = ip.length - 1
    var overflow = false
    var ti = intTpl.length - 1
    while (ti >= 0) {
      val c = intTpl.charAt(ti)
      c match {
        case '9' | '0' =>
          if (di >= 0) { sb.append(ip.charAt(di)); di -= 1 }
          else if (c == '0') sb.append('0')
          else if (!fm) sb.append(' ')
        case ',' =>
          // group separator appears only if digits continue to its left
          if (di >= 0 || intTpl.take(ti).exists(_ == '0')) sb.append(',')
        case other => sb.append(other)
      }
      ti -= 1
    }
    if (di >= 0) overflow = true
    val intPart = sb.reverse.toString
    val decPart =
      if (decDigits > 0) "." + dp.padTo(decDigits, '0').take(decDigits) else ""
    if (overflow) {
      // template too narrow: PG renders all '#'
      val hashes = tpl.map { case '9' | '0' => '#'; case c => c }
      (if (negative) "-" else " ") + hashes
    } else {
      val sign = if (negative) "-" else if (fm) "" else " "
      sign + (if (fm) intPart.dropWhile(_ == ' ') else intPart) + decPart
    }
  }
}
