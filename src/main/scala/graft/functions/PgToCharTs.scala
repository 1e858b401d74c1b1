package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL `to_char(timestamp, template)` — the datetime-template side
  * of `src/backend/utils/adt/formatting.c` (DCH_* keywords). Supported
  * tokens: YYYY YY MM DD HH24 HH12 MI SS Q DDD DY Dy Mon MONTH Month DAY
  * Day AM PM; any other character copies through verbatim.
  *
  * Native expression with codegen (static-call projection), same design
  * as [[PgToChar]]. */
case class PgToCharTs(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "pg_to_char_ts"

  override protected def nullSafeEval(ts: Any, fmt: Any): Any =
    UTF8String.fromString(
      PgToCharTs.format(ts.asInstanceOf[Long], fmt.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, f) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgToCharTs.format($t, $f.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgToCharTs =
    copy(left = newLeft, right = newRight)
}

object PgToCharTs {
  import java.time.{LocalDateTime, ZoneOffset}

  private val monAbbr = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val monFull = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val dayAbbr = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val dayFull = Array("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  /** Longest-match template scan, PG keyword table order. */
  def format(micros: Long, template: String): String = {
    val dt = LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000).toInt, ZoneOffset.UTC)
    val sb = new StringBuilder
    var i = 0
    val n = template.length
    def at(kw: String): Boolean = template.regionMatches(i, kw, 0, kw.length)
    while (i < n) {
      if (at("YYYY")) { sb.append(f"${dt.getYear}%04d"); i += 4 }
      else if (at("YY")) { sb.append(f"${dt.getYear % 100}%02d"); i += 2 }
      else if (at("MONTH")) { sb.append(monFull(dt.getMonthValue - 1).toUpperCase); i += 5 }
      else if (at("Month")) { sb.append(monFull(dt.getMonthValue - 1)); i += 5 }
      else if (at("Mon")) { sb.append(monAbbr(dt.getMonthValue - 1)); i += 3 }
      else if (at("MM")) { sb.append(f"${dt.getMonthValue}%02d"); i += 2 }
      else if (at("DDD")) { sb.append(f"${dt.getDayOfYear}%03d"); i += 3 }
      else if (at("DD")) { sb.append(f"${dt.getDayOfMonth}%02d"); i += 2 }
      else if (at("DAY")) { sb.append(dayFull(dt.getDayOfWeek.getValue - 1).toUpperCase); i += 3 }
      else if (at("Day")) { sb.append(dayFull(dt.getDayOfWeek.getValue - 1)); i += 3 }
      else if (at("DY")) { sb.append(dayAbbr(dt.getDayOfWeek.getValue - 1).toUpperCase); i += 2 }
      else if (at("Dy")) { sb.append(dayAbbr(dt.getDayOfWeek.getValue - 1)); i += 2 }
      else if (at("HH24")) { sb.append(f"${dt.getHour}%02d"); i += 4 }
      else if (at("HH12")) { val h = dt.getHour % 12; sb.append(f"${if (h == 0) 12 else h}%02d"); i += 4 }
      else if (at("MI")) { sb.append(f"${dt.getMinute}%02d"); i += 2 }
      else if (at("SS")) { sb.append(f"${dt.getSecond}%02d"); i += 2 }
      else if (at("Q")) { sb.append(((dt.getMonthValue - 1) / 3 + 1).toString); i += 1 }
      else if (at("AM") || at("PM")) { sb.append(if (dt.getHour < 12) "AM" else "PM"); i += 2 }
      else { sb.append(template.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
