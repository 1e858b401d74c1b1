package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k accumulator: keeps the k best (score, id) pairs, ordered
  * by score DESC then id ASC. A typed `Aggregator`, so Spark splits it
  * partial/final like any native aggregate (reduce ≙ sfunc, merge ≙
  * combinefunc — reference `src/include/catalog/pg_aggregate.dat`): each
  * map task ships AT MOST k pairs per group key across the shuffle,
  * replacing the sort-the-whole-partition Window plan for per-key top-k
  * (the r2-verdict's s01 note — a row_number window over few keys sorts
  * corpus×keys rows in few tasks; this partial-aggregates map-side).
  *
  * The buffer stays a sorted Seq capped at k, so reduce is O(k) and the
  * shuffled state is k×16 bytes regardless of input size.
  */
class TopKPairs(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def best(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy(p => (-p._1, p._2)).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    best(b :+ in)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(b1 ++ b2)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
