package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** OpenPGP CRC-24 (RFC 4880 §6.1, the checksum under ASCII armor's `=`
  * line; reference surface: pgcrypto's `armor()`/`dearmor()`,
  * contrib/pgcrypto/pgp-armor.c crc24 — same init 0xB704CE and
  * generator 0x1864CFB, a public algorithm). One compiled pass over the
  * bytes; the oracle re-derives it as the identical shift/xor fold in
  * SQL. */
case class Crc24(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "crc24"

  override protected def nullSafeEval(input: Any): Any =
    Crc24.crc(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Crc24.crc($c)")

  override protected def withNewChildInternal(newChild: Expression): Crc24 =
    copy(child = newChild)
}

object Crc24 {
  def crc(bytes: Array[Byte]): Long = {
    var crc = 0xB704CEL
    var i = 0
    while (i < bytes.length) {
      crc ^= (bytes(i) & 0xFFL) << 16
      var j = 0
      while (j < 8) {
        crc <<= 1
        if ((crc & 0x1000000L) != 0) crc ^= 0x1864CFBL
        j += 1
      }
      i += 1
    }
    crc & 0xFFFFFFL
  }
}
