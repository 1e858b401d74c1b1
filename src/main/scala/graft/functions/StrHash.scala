package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash mod 1e9+7 over a string's characters — the
  * shingle/token fingerprint kernel shared by the dedup family (d02
  * shingles, d04/d05 simhash token hashes, t04 fingerprints, q101 CMS).
  * Identical per-character arithmetic to the previous
  * `aggregate(split(s, ''), acc -> (acc*mult + ascii(c)) % p)` HOF
  * formulation and to the oracle's `list_reduce`, but as ONE static
  * primitive loop inside whole-stage codegen — the HOF path interprets
  * a lambda per character with boxing, which is the dominant cost of
  * the n-gram pipelines at corpus scale.
  */
case class StrHash(child: Expression, mult: Long, seed: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = s"str_hash$mult"

  override protected def nullSafeEval(input: Any): Any =
    StrHash.hash(input.asInstanceOf[UTF8String], mult, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StrHash.hash($c, ${mult}L, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): StrHash =
    copy(child = newChild)
}

object StrHash {
  /** acc = (acc*mult + char) % 1e9+7 left-to-right — char values match
    * `ascii()` per split('') element for the BMP (the corpus is ASCII). */
  def hash(s: UTF8String, mult: Long, seed: Long): Long = {
    val str = s.toString
    var acc = seed
    var i = 0
    while (i < str.length) {
      acc = (acc * mult + str.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }
}
