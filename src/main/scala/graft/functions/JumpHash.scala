package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Jump consistent hash — THE row→segment mapper of the reference's
  * distribution model (`src/backend/cdb/cdbhash.c:530`
  * `jump_consistent_hash`, applied to every DISTRIBUTED BY key at
  * `cdbhash.c:280`; the algorithm is Lamping & Veach's published
  * "A Fast, Minimal Memory, Consistent Hash Algorithm"). Its defining
  * property is what makes `gpexpand` cheap: growing from n to m
  * segments remaps a key iff its new bucket is ≥ n, so EXACTLY a
  * (m−n)/m expected fraction of rows moves and every moved row lands
  * on a NEW segment — no reshuffle of the surviving n segments.
  *
  * The loop is pure 64-bit LCG + one IEEE double division per jump
  * (O(ln n) expected iterations), so both engines reproduce it
  * bit-for-bit: Scala Long arithmetic wraps mod 2^64 exactly like the
  * C uint64, and the oracle replays the identical recursion in DuckDB
  * HUGEINT (see b05's recursive CTE).
  */
case class JumpHash(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets > 0, s"jump_hash: buckets must be positive, got $buckets")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "jump_hash"

  override protected def nullSafeEval(k: Any): Any =
    JumpHash.compute(k.asInstanceOf[Long], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, k =>
      s"graft.functions.JumpHash.compute($k, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): JumpHash =
    copy(child = newChild)
}

object JumpHash {
  /** Named `compute`, not `eval`: a companion `eval` gets no static
    * forwarder (clashes with Expression.eval), breaking codegen. */
  def compute(key0: Long, n: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < n) {
      b = j
      key = key * 2862933555777941757L + 1L
      // C: (b + 1) * ((double)(1LL << 31) / (double)((key >> 33) + 1)),
      // truncated toward zero by the int64 cast — mirrored exactly
      j = ((b + 1) * (2147483648.0 / ((key >>> 33) + 1).toDouble)).toLong
    }
    b.toInt
  }
}
