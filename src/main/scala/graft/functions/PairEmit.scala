package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Candidate-pair emission kernel for the posting-list dedup pattern
  * (d02 n-gram Jaccard, d03 MinHash-LSH): a sorted `array<bigint>` of
  * doc ids in one posting list → `array<struct<a_id,b_id>>` of its
  * candidate pairs, partition-locally, `a_id < b_id` by construction.
  * Lists longer than `cap` degrade to star pairs against the list
  * minimum — k-1 candidates instead of C(k,2) — the bounded-blowup
  * rule the LSH pipelines enforce at corpus scale (an over-full bucket
  * means near-certain duplicates, so hub-linking preserves recall).
  *
  * Same semantics as the previous
  * `flatten(transform(sequence(..), i -> transform(slice(..), ..)))`
  * HOF formulation, but as primitive loops in ONE compiled call per
  * list instead of an interpreted lambda per element: at sf0.1, d02
  * alone emits 1.27M pairs through this path (measured via the oracle's
  * posting lists), and the HOF interpreter allocated a boxed struct +
  * two nested closures per pair. Reference analog: the pairwise
  * candidate loop in tsrank.c's cover finding — tight C, not per-pair
  * dispatch.
  */
case class PairEmit(child: Expression, cap: Int) extends UnaryExpression {

  private val pairType = StructType(Seq(
    StructField("a_id", LongType, nullable = true),
    StructField("b_id", LongType, nullable = true)))

  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  override def prettyName: String = "pair_emit"

  override protected def nullSafeEval(input: Any): Any =
    PairEmit.emit(input.asInstanceOf[ArrayData], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairEmit.emit($c, $cap)")

  override protected def withNewChildInternal(newChild: Expression): PairEmit =
    copy(child = newChild)
}

/** Size-aware variant for threshold similarity joins (d02 Jaccard ≥ 0.5):
  * input is a posting list of `struct<doc:bigint, sz:bigint>` sorted by
  * doc id; output pairs carry both sizes so the downstream intersection
  * count needs NO size joins (sizes ride the group key — they are a
  * functional dependency of the ids). Pairs that can NEVER reach the
  * threshold are pruned at emission: jaccard ≤ min_sz/max_sz, so a pair
  * is kept only when min_sz·10⁷ ≥ 4999995·max_sz — the exact integer
  * form of round(min/max, 6) ≥ 0.5, i.e. the prune drops only pairs
  * whose BEST-CASE rounded jaccard is still < 0.5 (length filtering, as
  * in prefix/positional-filtering similarity-join literature; also the
  * reason the candidate volume stays subquadratic on a skewed corpus).
  * Lists longer than `cap` degrade to star pairs like pair_emit. */
case class PairEmitSized(child: Expression, cap: Int) extends UnaryExpression {

  private val pairType = StructType(Seq(
    StructField("a_id", LongType, nullable = true),
    StructField("b_id", LongType, nullable = true),
    StructField("a_sz", LongType, nullable = true),
    StructField("b_sz", LongType, nullable = true)))

  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  override def prettyName: String = "pair_emit_sized"

  override protected def nullSafeEval(input: Any): Any =
    PairEmit.emitSized(input.asInstanceOf[ArrayData], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairEmit.emitSized($c, $cap)")

  override protected def withNewChildInternal(newChild: Expression): PairEmitSized =
    copy(child = newChild)
}

/** PairEmitSized without the jaccard length prune — for ASYMMETRIC
  * thresholds (d09 containment: a tiny set fully inside a huge one is
  * the signal, so no size ratio may drop pairs) that still want sizes
  * riding the group key (no post-aggregate size joins). */
case class PairEmitSizedAll(child: Expression, cap: Int) extends UnaryExpression {

  private val pairType = StructType(Seq(
    StructField("a_id", LongType, nullable = true),
    StructField("b_id", LongType, nullable = true),
    StructField("a_sz", LongType, nullable = true),
    StructField("b_sz", LongType, nullable = true)))

  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  override def prettyName: String = "pair_emit_sized_all"

  override protected def nullSafeEval(input: Any): Any =
    PairEmit.emitSizedAll(input.asInstanceOf[ArrayData], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairEmit.emitSizedAll($c, $cap)")

  override protected def withNewChildInternal(newChild: Expression): PairEmitSizedAll =
    copy(child = newChild)
}

object PairEmit {
  /** All ordered pairs of a sorted id list (star pairs past `cap`). */
  def emit(ds: ArrayData, cap: Int): ArrayData = {
    val n = ds.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out =
      if (n <= cap) {
        val rows = new Array[Any](n * (n - 1) / 2)
        var k = 0
        var i = 0
        while (i < n - 1) {
          val a = ds.getLong(i)
          var j = i + 1
          while (j < n) {
            rows(k) = new GenericInternalRow(Array[Any](a, ds.getLong(j)))
            k += 1
            j += 1
          }
          i += 1
        }
        rows
      } else {
        val hub = ds.getLong(0)
        val rows = new Array[Any](n - 1)
        var j = 1
        while (j < n) {
          rows(j - 1) = new GenericInternalRow(Array[Any](hub, ds.getLong(j)))
          j += 1
        }
        rows
      }
    new GenericArrayData(out)
  }

  /** keep iff round(min/max, 6) ≥ 0.5 can hold (see PairEmitSized). */
  @inline private def ratioKeep(sa: Long, sb: Long): Boolean = {
    val mn = math.min(sa, sb); val mx = math.max(sa, sb)
    mn * 10000000L >= 4999995L * mx
  }

  /** Size-carrying, threshold-pruned pair emission (see PairEmitSized). */
  def emitSized(ds: ArrayData, cap: Int): ArrayData = {
    val n = ds.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val docs = new Array[Long](n)
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ds.getStruct(i, 2)
      docs(i) = r.getLong(0); szs(i) = r.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n <= cap) {
      i = 0
      while (i < n - 1) {
        var j = i + 1
        while (j < n) {
          if (ratioKeep(szs(i), szs(j)))
            out += new GenericInternalRow(Array[Any](docs(i), docs(j), szs(i), szs(j)))
          j += 1
        }
        i += 1
      }
    } else {
      var j = 1
      while (j < n) {
        if (ratioKeep(szs(0), szs(j)))
          out += new GenericInternalRow(Array[Any](docs(0), docs(j), szs(0), szs(j)))
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Size-carrying, UNPRUNED pair emission (see PairEmitSizedAll). */
  def emitSizedAll(ds: ArrayData, cap: Int): ArrayData = {
    val n = ds.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val docs = new Array[Long](n)
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ds.getStruct(i, 2)
      docs(i) = r.getLong(0); szs(i) = r.getLong(1)
      i += 1
    }
    val out =
      if (n <= cap) {
        val rows = new Array[Any](n * (n - 1) / 2)
        var k = 0
        i = 0
        while (i < n - 1) {
          var j = i + 1
          while (j < n) {
            rows(k) = new GenericInternalRow(Array[Any](docs(i), docs(j), szs(i), szs(j)))
            k += 1; j += 1
          }
          i += 1
        }
        rows
      } else {
        val rows = new Array[Any](n - 1)
        var j = 1
        while (j < n) {
          rows(j - 1) = new GenericInternalRow(Array[Any](docs(0), docs(j), szs(0), szs(j)))
          j += 1
        }
        rows
      }
    new GenericArrayData(out)
  }
}
