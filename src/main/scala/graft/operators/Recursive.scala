package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Recursive CTE (`WITH RECURSIVE`, reference nodeRecursiveunion.c /
  * nodeWorktablescan.c). Spark has no recursive-union operator, so the
  * standard Spark-native rendition is a driver-side fixpoint loop that
  * unions per-iteration DataFrames (SURVEY.md §7.3): the *data* stays
  * distributed — the driver only orchestrates one plan per step — and the
  * iteration count is bounded, so the final plan is a static union that
  * Catalyst optimizes as a whole.
  */
object Recursive {

  private val maxDepth = 10

  /** Collatz descent seeded from order keys: the recursive step is pure
    * arithmetic so the DuckDB oracle (a genuine WITH RECURSIVE) computes
    * the identical rows. */
  private def collatzChain(s: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.df(s, dir, "orders")
      .filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey").as("seed")).distinct()
    val base = seeds.select(col("seed"), lit(0).as("step"), col("seed").as("val"))
      .localCheckpoint()
    // fixpoint loop ≙ RecursiveUnion: frontier_{i+1} = f(frontier_i).
    // Each frontier is checkpointed to cut lineage — without this the
    // k-th iteration's plan nests k copies of the whole chain (quadratic
    // plan size, the classic iterative-algorithm failure mode at scale).
    val frames = Iterator.iterate(base) { frontier =>
      frontier
        .filter(col("val") > 1 && col("step") < maxDepth)
        .select(col("seed"), (col("step") + 1).as("step"),
          when(col("val") % 2 === 0, expr("val div 2")).otherwise(col("val") * 3 + 1).as("val"))
        .localCheckpoint()
    }.take(maxDepth + 1).toSeq
    frames.reduce(_ union _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r01_recursive_collatz" -> { (s, dir) =>
      collatzChain(s, dir).orderBy(col("seed"), col("step"))
    }
  )

  def oracle: Map[String, String] = Map(
    "r01_recursive_collatz" -> s"""
      WITH RECURSIVE chain(seed, step, val) AS (
        SELECT DISTINCT o_orderkey AS seed, 0 AS step, o_orderkey AS val
        FROM orders WHERE o_orderkey <= 100
        UNION ALL
        SELECT seed, step + 1,
          CASE WHEN val % 2 = 0 THEN val // 2 ELSE val * 3 + 1 END
        FROM chain WHERE val > 1 AND step < $maxDepth)
      SELECT seed, step, val FROM chain ORDER BY seed, step"""
  )
}
