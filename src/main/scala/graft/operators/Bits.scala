package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bit-string slice (reference `src/backend/utils/adt/varbit.c` +
  * varbit aggregate support in `src/backend/utils/adt/numeric.c`): the
  * operator surface PG's bit(n)/varbit carries — shift (`<<`), AND/OR/
  * XOR (bitand/bitor/bitxor), popcount (bit_count) — over a 12-bit
  * activity bitmap packed into a BIGINT word, exactly how the reference
  * stores short varbits (one word + length header). Arithmetic is
  * identical in both engines; no UDF, everything codegen'd.
  *
  * The query builds the classic retention bitmap: one bit per calendar
  * month a customer ordered in, split into even-year and odd-year maps,
  * then compares the two halves bitwise. Per-month bitmaps over a keyed
  * groupBy are the 100 TB shape too — bit_or partial-aggregates
  * map-side to one word per (customer) group.
  */
object Bits {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bt01_varbit_bitmap" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(shiftleft(1, month(o_orderdate) - 1) AS BIGINT)").as("mbit"),
          expr("year(o_orderdate) % 2").as("par"))
        .groupBy(col("o_custkey"))
        .agg(
          expr("bit_or(CASE WHEN par = 0 THEN mbit ELSE 0 END)").as("m_even"),
          expr("bit_or(CASE WHEN par = 1 THEN mbit ELSE 0 END)").as("m_odd"))
        .withColumn("both_m", expr("m_even & m_odd"))
        .withColumn("either_m", expr("m_even | m_odd"))
        .withColumn("diff_m", expr("m_even ^ m_odd"))
        .groupBy(expr("CAST(bit_count(both_m) AS BIGINT)").as("n_common_months"))
        .agg(
          count(lit(1)).as("n_customers"),
          expr("CAST(sum(bit_count(either_m)) AS BIGINT)").as("sum_either_bits"),
          expr("CAST(sum(bit_count(diff_m)) AS BIGINT)").as("sum_diff_bits"),
          max(col("diff_m")).as("max_diff_word"))
        .orderBy(col("n_common_months"))
    }
  )

  def oracle: Map[String, String] = Map(
    // DuckDB: `<<`/`&`/`|`/xor()/bit_count over BIGINT — same words.
    "bt01_varbit_bitmap" -> """
      WITH maps AS (
        SELECT o_custkey,
               bit_or(CASE WHEN year(o_orderdate) % 2 = 0
                 THEN CAST(1 AS BIGINT) << (month(o_orderdate) - 1) ELSE 0 END) AS m_even,
               bit_or(CASE WHEN year(o_orderdate) % 2 = 1
                 THEN CAST(1 AS BIGINT) << (month(o_orderdate) - 1) ELSE 0 END) AS m_odd
        FROM orders GROUP BY o_custkey)
      SELECT CAST(bit_count(m_even & m_odd) AS BIGINT) AS n_common_months,
             count(*) AS n_customers,
             CAST(sum(bit_count(m_even | m_odd)) AS BIGINT) AS sum_either_bits,
             CAST(sum(bit_count(xor(m_even, m_odd))) AS BIGINT) AS sum_diff_bits,
             max(xor(m_even, m_odd)) AS max_diff_word
      FROM maps
      GROUP BY 1
      ORDER BY 1"""
  )
}
