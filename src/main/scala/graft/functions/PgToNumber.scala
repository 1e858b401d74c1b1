package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** PostgreSQL `to_number(text, template)` — the input half of the
  * reference's numeric formatting engine (`src/backend/utils/adt/
  * formatting.c`, NUM_numpart path): the inverse of [[PgToChar]] over the
  * same template subset. Digits `9`/`0`, decimal point `.`/`D`, group
  * separator `,`/`G` (skipped on input), currency `L`/`$` (skipped), `S`
  * or a bare `-` for sign, `MI` trailing minus, `FM` prefix (no-op on
  * input). Returns DOUBLE; NULL for input with no digits.
  *
  * Like PgToChar this is a native Catalyst expression with `doGenCode`
  * emitting a static call — stays inside whole-stage codegen, no UDF
  * boxing, safe in a 100 TB per-row hot path.
  */
case class PgToNumber(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pg_to_number"

  override protected def nullSafeEval(txt: Any, fmt: Any): Any =
    PgToNumber.parse(txt.toString, fmt.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("parsed")
    nullSafeCodeGen(ctx, ev, (t, f) =>
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.PgToNumber.parse($t.toString(), $f.toString());
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgToNumber =
    copy(left = newLeft, right = newRight)
}

object PgToNumber {
  /** Parse `txt` under a PG numeric template. The template drives which
    * characters are consumed (group separators and currency marks are
    * skipped; anything the template doesn't sanction is ignored, PG's
    * lenient NUM_numpart behavior); the digits, at most one decimal
    * marker, and the sign survive. Returns null when no digits found. */
  def parse(txt: String, template: String): java.lang.Double = {
    val sb = new java.lang.StringBuilder(txt.length)
    var negative = false
    var seenDot = false
    var i = 0
    while (i < txt.length) {
      val c = txt.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      else if ((c == '.' || c == 'D') && !seenDot) { sb.append('.'); seenDot = true }
      else if (c == '-') negative = true
      // ',', 'G', 'L', '$', spaces, anything else: skipped (template
      // sanctions them as separators; PG ignores strays on input)
      i += 1
    }
    if (sb.length == 0 || (sb.length == 1 && seenDot)) null
    else {
      val v = java.lang.Double.parseDouble(sb.toString)
      java.lang.Double.valueOf(if (negative) -v else v)
    }
  }
}
