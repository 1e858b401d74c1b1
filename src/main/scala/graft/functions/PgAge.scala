package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** PostgreSQL `age(later, earlier)` → symbolic calendar interval, the
  * (years, months, days) component triple (reference:
  * `src/backend/utils/adt/timestamp.c` `timestamp_age`): component-wise
  * subtraction with calendar borrowing — days borrow from the month
  * PRECEDING the later timestamp's month, months borrow 12 from years.
  * DuckDB's `age()` implements the same algorithm, which is what the
  * oracle compares against.
  *
  * Native expression with codegen: the static helper returns a packed
  * long (years<<32 | months<<16 | days) decoded into an InternalRow, so
  * the hot path is one static call inside whole-stage codegen.
  */
case class PgAge(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("years", IntegerType, nullable = false),
    StructField("months", IntegerType, nullable = false),
    StructField("days", IntegerType, nullable = false)))
  override def prettyName: String = "pg_age"

  override protected def nullSafeEval(t1: Any, t2: Any): Any = {
    val packed = PgAge.agePacked(t1.asInstanceOf[Long], t2.asInstanceOf[Long])
    PgAge.unpack(packed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PgAge.unpack(graft.functions.PgAge.agePacked($a, $b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgAge =
    copy(left = newLeft, right = newRight)
}

object PgAge {
  import java.time.LocalDateTime
  import java.time.ZoneOffset

  private def toDt(micros: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000).toInt,
      ZoneOffset.UTC)

  /** Calendar age of `laterMicros` relative to `earlierMicros`, packed as
    * (years << 32) | (months << 16) | days (all non-negative when later
    * >= earlier; negative ages mirror PG by negating components). */
  def agePacked(laterMicros: Long, earlierMicros: Long): Long = {
    val neg = laterMicros < earlierMicros
    val (a, b) =
      if (neg) (toDt(earlierMicros), toDt(laterMicros))
      else (toDt(laterMicros), toDt(earlierMicros))
    var years = a.getYear - b.getYear
    var months = a.getMonthValue - b.getMonthValue
    var days = a.getDayOfMonth - b.getDayOfMonth
    // time-of-day borrow (we only surface Y/M/D; sub-day remainder just
    // borrows one day, matching PG's cascade)
    val timeA = a.toLocalTime.toNanoOfDay
    val timeB = b.toLocalTime.toNanoOfDay
    if (timeA < timeB) days -= 1
    while (days < 0) {
      months -= 1
      // PG borrows the EARLIER timestamp's current month length
      // (timestamp.c timestamp_age: day_tab[isleap(tm2)][tm2_mon - 1])
      days += b.toLocalDate.lengthOfMonth()
    }
    if (months < 0) { years -= 1; months += 12 }
    val s = if (neg) -1 else 1
    ((s * years).toLong << 32) | ((s * months).toLong & 0xffffL) << 16 | ((s * days).toLong & 0xffffL)
  }

  def unpack(packed: Long): InternalRow = {
    val years = (packed >> 32).toInt
    val months = ((packed >> 16) & 0xffffL).toShort.toInt
    val days = (packed & 0xffffL).toShort.toInt
    new GenericInternalRow(Array[Any](years, months, days))
  }
}
