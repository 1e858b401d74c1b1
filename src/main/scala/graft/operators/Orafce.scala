package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Oracle-compatibility function family (reference `gpcontrib/orafce/`):
  * the date arithmetic of `datefce.c` (next_day:175, last_day,
  * months_between, add_months, ora_date_trunc — PG_FUNCTION_INFO_V1
  * block at datefce.c:105-116), `others.c:476 ora_decode`, and the
  * charpad/plvstr string helpers. Spark-first: every one of these is a
  * built-in (`add_months`, `last_day`, `next_day`, `months_between`,
  * `trunc`, `nvl`, `nvl2`, `lpad`, `instr`) — the queries exercise them
  * per-row inside whole-stage codegen; no UDF, no shuffle besides the
  * output sort.
  *
  * Cross-engine exactness: months_between returns a float whose
  * fractional part is (d1-d2)/31 (datefce.c months_between — day parts
  * ignored only when BOTH dates are month-ends), so the hash-compared
  * column is mb31 = months_between × 31 rounded to BIGINT — an exact
  * integer ((y1-y2)·372 + (m1-m2)·31 + d1-d2) on both engines, immune
  * to float repr.
  */
object Orafce {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "or01_ora_dates" -> { (s, dir) =>
      // o_orderdate is parquet TIMESTAMP (midnight UTC); date functions
      // operate on the DATE projection on both engines
      Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .withColumn("od", to_date(col("o_orderdate")))
        .select(
          col("o_orderkey"), col("od"),
          // datefce.c add_months is Oracle month-end-sticky: adding to
          // the LAST day of a month lands on the last day of the target
          // month (ADD_MONTHS('1995-02-28',1) = '1995-03-31'). Spark's
          // built-in only clamps overflow, so emulate the sticky rule
          // explicitly — the identical CASE runs on the oracle side.
          when(col("od") === last_day(col("od")),
            last_day(add_months(col("od"), 5)))
            .otherwise(add_months(col("od"), 5)).as("am5"),
          last_day(col("od")).as("ld"),
          next_day(col("od"), "FRI").as("nd_fri"),
          trunc(col("od"), "quarter").as("tq"),
          expr("CAST(round(months_between(od, DATE'1995-06-15') * 31) AS BIGINT)")
            .as("mb31"))
        .orderBy(col("o_orderkey"))
    },

    "or02_nvl_decode" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        // a third of the priorities "missing" — deterministic null source
        .withColumn("prio_opt",
          when(col("o_orderkey") % 3 === 0, lit(null)).otherwise(col("o_orderpriority")))
        .select(
          col("o_orderkey"),
          expr("nvl(prio_opt, 'UNSET')").as("prio_nvl"),
          expr("nvl2(prio_opt, 'present', 'missing')").as("prio_nvl2"),
          // ora_decode (others.c:476) is first-match-wins — CASE exactly
          expr("CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled' " +
            "WHEN 'P' THEN 'partial' ELSE 'other' END").as("status_decoded"),
          lpad(col("o_orderkey").cast("string"), 12, "0").as("key_padded"),
          expr("instr(o_orderpriority, 'URGENT')").as("pos_urgent"),
          expr("substring(o_orderpriority, 3, 6)").as("prio_mid"))
        .orderBy(col("o_orderkey"))
    }
  )

  def oracle: Map[String, String] = Map(
    "or01_ora_dates" -> """
      WITH src AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
        FROM orders WHERE o_custkey <= 50)
      SELECT o_orderkey, od,
        CASE WHEN od = last_day(od)
          THEN last_day(CAST(od + INTERVAL 5 MONTH AS DATE))
          ELSE CAST(od + INTERVAL 5 MONTH AS DATE) END AS am5,
        last_day(od) AS ld,
        od + CAST(CASE WHEN (5 - dayofweek(od) + 7) % 7 = 0
          THEN 7 ELSE (5 - dayofweek(od) + 7) % 7 END AS INT) AS nd_fri,
        CAST(date_trunc('quarter', od) AS DATE) AS tq,
        CAST((year(od) - 1995) * 372 + (month(od) - 6) * 31
             + (day(od) - 15) AS BIGINT) AS mb31
      FROM src ORDER BY o_orderkey""",

    "or02_nvl_decode" -> """
      WITH src AS (
        SELECT o_orderkey, o_orderstatus, o_orderpriority,
          CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS prio_opt
        FROM orders WHERE o_custkey <= 50)
      SELECT o_orderkey,
        coalesce(prio_opt, 'UNSET') AS prio_nvl,
        CASE WHEN prio_opt IS NOT NULL THEN 'present' ELSE 'missing' END AS prio_nvl2,
        CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
          WHEN 'P' THEN 'partial' ELSE 'other' END AS status_decoded,
        lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
        CAST(strpos(o_orderpriority, 'URGENT') AS INT) AS pos_urgent,
        substring(o_orderpriority, 3, 6) AS prio_mid
      FROM src ORDER BY o_orderkey"""
  )
}
