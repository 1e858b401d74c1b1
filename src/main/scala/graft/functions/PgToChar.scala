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
    if (tpl == "RN") return formatRN(value, fm)
    if (tpl.contains("EEEE")) return formatEEEE(value, tpl, fm)
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

  /** `RN` — roman numerals (`formatting.c:905` NUM_RN / NUM_roman):
    * valid for 1..3999, right-aligned in 15 columns (FM strips the
    * padding), out-of-range renders as 15 '#'s. */
  private val RomanVals = Seq(
    1000 -> "M", 900 -> "CM", 500 -> "D", 400 -> "CD", 100 -> "C",
    90 -> "XC", 50 -> "L", 40 -> "XL", 10 -> "X", 9 -> "IX",
    5 -> "V", 4 -> "IV", 1 -> "I")
  private def formatRN(value: Double, fm: Boolean): String = {
    val n =
      try java.math.BigDecimal.valueOf(value)
        .setScale(0, java.math.RoundingMode.HALF_UP).intValueExact()
      catch { case _: ArithmeticException => -1 } // magnitude beyond Int
    if (n < 1 || n > 3999) return "#" * 15
    val sb = new StringBuilder
    var r = n
    for ((v, s) <- RomanVals) while (r >= v) { sb.append(s); r -= v }
    if (fm) sb.toString else ("%15s").format(sb.toString)
  }

  /** `EEEE` — scientific notation (`formatting.c` NUM_E): mantissa laid
    * into the digit template before EEEE, exponent always signed with
    * at least two digits; sign column as usual (FM strips the leading
    * space on positives). Mantissa rounding is decimal half-up via
    * BigDecimal on the double's shortest decimal form — deterministic
    * and engine-independent, same discipline as the fixed templates. */
  private def formatEEEE(value: Double, tpl: String, fm: Boolean): String = {
    val core = tpl.substring(0, tpl.indexOf("EEEE"))
    val decDigits = core.indexOf('.') match {
      case -1 => 0
      case i  => core.substring(i + 1).count(c => c == '9' || c == '0')
    }
    val neg = value < 0
    val av = math.abs(value)
    var exp = if (av == 0d) 0 else math.floor(math.log10(av)).toInt
    var mant =
      if (av == 0d) java.math.BigDecimal.ZERO.setScale(decDigits)
      else java.math.BigDecimal.valueOf(av).movePointLeft(exp)
        .setScale(decDigits, java.math.RoundingMode.HALF_UP)
    // rounding can push the mantissa to 10.x (e.g. 9.995 at 2 digits)
    if (mant.compareTo(java.math.BigDecimal.TEN) >= 0) {
      mant = mant.movePointLeft(1)
        .setScale(decDigits, java.math.RoundingMode.HALF_UP)
      exp += 1
    }
    val sign = if (neg) "-" else if (fm) "" else " "
    val esign = if (exp < 0) "-" else "+"
    sign + mant.toPlainString + "e" + esign + f"${math.abs(exp)}%02d"
  }
}
