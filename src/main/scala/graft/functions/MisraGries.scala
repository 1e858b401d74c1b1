package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra-Gries heavy-hitters summary with capacity k: a bounded-memory
  * frequent-items sketch (Misra & Gries 1982; the SpaceSaving/MG family
  * every streaming heavy-hitters system uses). Typed `Aggregator`, so
  * Spark splits it partial/final (reduce ≙ sfunc, merge ≙ combinefunc,
  * reference `src/include/catalog/pg_aggregate.dat`): each map task
  * ships AT MOST k (item, weight) entries across the shuffle no matter
  * how many rows it saw — the 100 TB corpus-stats shape, vs. an exact
  * census whose shuffle is O(vocabulary).
  *
  * Guarantee (any merge order, any partitioning): every item with true
  * frequency > N/(k+1) survives in the summary, and each kept weight
  * undercounts by at most N/(k+1). The t17 query audits exactly that
  * guarantee against the exact census.
  *
  * reduce: classic MG — increment if present; insert if room; else
  * decrement ALL entries by 1 (dropping zeros). merge: add weights,
  * then if over capacity subtract the (k+1)-th largest weight and keep
  * the strictly-positive survivors (Agarwal et al.'s mergeable-summaries
  * construction, preserving the error bound).
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        b.iterator.map { case (w, c) => (w, c - 1) }
          .filter(_._2 > 0).toMap
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val summed = (b1.keySet ++ b2.keySet).iterator
      .map(w => w -> (b1.getOrElse(w, 0L) + b2.getOrElse(w, 0L))).toMap
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sortBy(-_)(Ordering.Long).apply(k)
      summed.iterator.map { case (w, c) => (w, c - cut) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
