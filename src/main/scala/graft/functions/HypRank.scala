package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Hypothetical-set `rank(h) WITHIN GROUP (ORDER BY v)` as a typed
  * Aggregator — the UDAF surface (reference `CREATE AGGREGATE`,
  * `src/include/catalog/pg_aggregate.dat`; hypothetical-set aggs in
  * `src/backend/utils/adt/orderedsetaggs.c` hypothetical_rank_common).
  *
  * The Aggregator contract maps 1:1 onto PG's aggregate support
  * functions: `reduce` ≙ sfunc, `merge` ≙ combinefunc (this is what
  * makes it distribution-safe — partial states combine associatively
  * across partitions, one shuffle of 8-byte states), `finish` ≙
  * finalfunc. rank(h) = 1 + |{v : v < h}|.
  */
object HypRank extends Aggregator[(Double, Double), Long, Long] {
  override def zero: Long = 0L
  override def reduce(b: Long, in: (Double, Double)): Long =
    if (in._1 < in._2) b + 1 else b
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(reduction: Long): Long = reduction + 1
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
