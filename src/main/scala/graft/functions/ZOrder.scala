package graft.functions

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the PAX write-time clustering
  * feature (`contrib/pax_storage/src/cpp/clustering/zorder_clustering.cc`):
  * interleave the bits of two dimensions so that sorting by the combined
  * key co-locates rows that are close in EITHER dimension, letting
  * parquet row-group min/max stats (zone maps) skip data for range
  * predicates on both columns.
  *
  * The key build is pure integer arithmetic (codegen'd higher-order
  * function, oracle-reproducible); [[clusteredWrite]] is the write-time
  * path: range-repartition + in-partition sort by z-value, which is
  * exactly "CLUSTER BY zorder(a, b)".
  */
object ZOrder {

  /** Spark SQL expression: interleave the low `bits` bits of `x` (odd
    * positions) and `y` (even positions). */
  def interleaveExpr(x: String, y: String, bits: Int): String =
    s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, b) ->
          acc + ((($x) div CAST(pow(2, b) AS BIGINT)) % 2) * CAST(pow(2, 2*b+1) AS BIGINT)
              + ((($y) div CAST(pow(2, b) AS BIGINT)) % 2) * CAST(pow(2, 2*b) AS BIGINT))"""

  /** The identical computation in DuckDB SQL (for oracles). */
  def duckdbInterleave(x: String, y: String, bits: Int): String =
    s"""CAST(list_sum(list_transform(generate_series(0, ${bits - 1}), b ->
          ((($x) // CAST(pow(2, b) AS BIGINT)) % 2) * CAST(pow(2, 2*b+1) AS BIGINT)
        + ((($y) // CAST(pow(2, b) AS BIGINT)) % 2) * CAST(pow(2, 2*b) AS BIGINT))) AS BIGINT)"""

  /** JVM reference implementation (tests). */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var acc = 0L
    var b = 0
    while (b < bits) {
      acc += ((x >> b) & 1L) << (2 * b + 1)
      acc += ((y >> b) & 1L) << (2 * b)
      b += 1
    }
    acc
  }

  /** Write-time clustering: range-partition then sort within partitions
    * by the z-value, so every output file covers a compact z-range and
    * its min/max stats prune on both dimensions. */
  def clusteredWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                     path: String, numFiles: Int = 8): Unit =
    df.withColumn("__z", expr(interleaveExpr(xCol, yCol, bits)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
