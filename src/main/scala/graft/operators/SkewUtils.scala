package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for shuffle joins.
  *
  * Reference analogs: hash-join skew buckets (`src/backend/executor/
  * nodeHash.c`) and ORCA's broadcast-vs-redistribute costing. Spark's
  * first line of defense is AQE skew-join splitting (on by default);
  * salting is the explicit fallback for the case AQE can't fix — a
  * single hot key whose rows exceed one task's memory on BOTH sides.
  *
  * `saltedJoin` splits the left (large, skewed) side's hot keys across
  * `salts` shuffle partitions by appending a pseudo-random salt to the
  * key, and replicates the right side once per salt value so every
  * (key, salt) pair finds its match. Row multiplicity is preserved
  * exactly — the join result equals the unsalted join (asserted in
  * ScaleSpec).
  */
object SkewUtils {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
