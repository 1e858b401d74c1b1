package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** PostgreSQL `to_timestamp(text, template)` / `to_date(text, template)`
  * — the INPUT side of `src/backend/utils/adt/formatting.c`
  * (`do_to_timestamp`:1060, `DCH_from_char`): a template-driven field
  * collector that scans the datetime template left to right,
  * longest-keyword-first, pulling each field's value out of the input
  * string, then assembles the timestamp. Supported tokens: YYYY YY MM DD
  * HH24 HH12 HH MI SS Mon MONTH Month AM PM; any other template char
  * must match the input verbatim (PG's separator handling, strict form).
  * Numeric fields read a digit run capped at the field's width, like
  * `from_char_parse_int_len`; month names match case-insensitively like
  * `from_char_seq_search`. A non-matching input raises
  * IllegalArgumentException — PG errors with "invalid value for ..."
  * the same way.
  *
  * Native expression with codegen (static-call projection), the exact
  * mirror of [[PgToCharTs]]; returns TIMESTAMP micros (UTC, matching
  * the session timezone the engine pins). */
case class PgToTimestamp(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = TimestampType
  override def prettyName: String = "pg_to_timestamp"

  override protected def nullSafeEval(s: Any, fmt: Any): Any =
    PgToTimestamp.parse(s.toString, fmt.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f) =>
      s"graft.functions.PgToTimestamp.parse($s.toString(), $f.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgToTimestamp =
    copy(left = newLeft, right = newRight)
}

object PgToTimestamp {
  import java.time.LocalDateTime

  private val monAbbr = Array("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec")
  private val monFull = Array("january", "february", "march", "april",
    "may", "june", "july", "august", "september", "october", "november",
    "december")

  /** Template-driven parse → epoch micros (UTC). */
  def parse(input: String, template: String): Long = {
    var y = 1970; var mo = 1; var d = 1
    var h = 0; var mi = 0; var sec = 0
    var h12 = -1; var pm = false; var sawAmPm = false
    var i = 0 // template cursor
    var j = 0 // input cursor

    def err(what: String): Nothing =
      throw new IllegalArgumentException(
        s"""invalid value for "$what" in "$input" (template "$template")""")

    // digit run capped at len chars (from_char_parse_int_len)
    def readInt(len: Int, what: String): Int = {
      var k = 0; var v = 0
      while (k < len && j < input.length && Character.isDigit(input.charAt(j))) {
        v = v * 10 + (input.charAt(j) - '0'); j += 1; k += 1
      }
      if (k == 0) err(what)
      v
    }

    // case-insensitive name table lookup (from_char_seq_search)
    def readName(names: Array[String], what: String): Int = {
      var idx = 0
      while (idx < names.length) {
        val n = names(idx)
        if (j + n.length <= input.length &&
          input.regionMatches(true, j, n, 0, n.length)) {
          j += n.length
          return idx + 1
        }
        idx += 1
      }
      err(what)
    }

    def at(kw: String): Boolean = template.startsWith(kw, i)

    while (i < template.length) {
      if (at("YYYY")) { y = readInt(4, "YYYY"); i += 4 }
      else if (at("YY")) {
        // formatting.c's nearest-century adjustment (do_to_timestamp →
        // DCH_YY): two-digit years < 70 land in 20xx, 70–99 in 19xx
        val v = readInt(2, "YY")
        y = if (v < 70) 2000 + v else 1900 + v
        i += 2
      }
      else if (at("MONTH") || at("Month")) { mo = readName(monFull, "Month"); i += 5 }
      else if (at("Mon") || at("MON")) { mo = readName(monAbbr, "Mon"); i += 3 }
      else if (at("MM")) { mo = readInt(2, "MM"); i += 2 }
      else if (at("DD")) { d = readInt(2, "DD"); i += 2 }
      else if (at("HH24")) { h = readInt(2, "HH24"); i += 4 }
      else if (at("HH12")) { h12 = readInt(2, "HH12"); i += 4 }
      else if (at("HH")) { h12 = readInt(2, "HH"); i += 2 }
      else if (at("MI")) { mi = readInt(2, "MI"); i += 2 }
      else if (at("SS")) { sec = readInt(2, "SS"); i += 2 }
      else if (at("AM") || at("PM")) {
        sawAmPm = true
        if (j + 2 > input.length) err("AM/PM")
        val tok = input.substring(j, j + 2)
        if (tok.equalsIgnoreCase("PM")) pm = true
        else if (!tok.equalsIgnoreCase("AM")) err("AM/PM")
        j += 2; i += 2
      }
      else { // literal separator: must match verbatim
        if (j >= input.length || input.charAt(j) != template.charAt(i))
          err(template.charAt(i).toString)
        j += 1; i += 1
      }
    }
    if (h12 >= 0) { // 12-hour clock (DCH_HH12 + meridiem)
      val base = h12 % 12
      h = if (sawAmPm && pm) base + 12 else base
    }
    val dt = LocalDateTime.of(y, mo, d, h, mi, sec)
    dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
  }
}
