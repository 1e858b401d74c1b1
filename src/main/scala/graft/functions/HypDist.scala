package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** The remaining hypothetical-set aggregates next to [[HypRank]]
  * (reference `src/backend/utils/adt/orderedsetaggs.c`:
  * `hypothetical_percent_rank_final`, `hypothetical_cume_dist_final`) —
  * `AGG(h) WITHIN GROUP (ORDER BY v)` computed as if `h` were inserted
  * into the group. Same distribution story as HypRank: two-counter
  * partial states (8/16 bytes) combine associatively across partitions,
  * so the shuffle carries O(groups) state regardless of group size.
  *
  * percent_rank(h) = |{v : v < h}| / N        (rank−1 over N+1−1 rows)
  * cume_dist(h)    = (|{v : v ≤ h}| + 1) / (N + 1)
  */
object HypPercentRank extends Aggregator[(Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) =
    (if (in._1 < in._2) b._1 + 1 else b._1, b._2 + 1)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) 0.0 else r._1.toDouble / r._2
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HypCumeDist extends Aggregator[(Double, Double), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) =
    (if (in._1 <= in._2) b._1 + 1 else b._1, b._2 + 1)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Long, Long)): Double =
    (r._1 + 1).toDouble / (r._2 + 1)
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
