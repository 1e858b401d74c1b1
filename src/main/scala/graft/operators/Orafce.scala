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

    // -- or03: the datefce ROUND family (datefce.c:472 _ora_date_round)
    //    + trunc breadth (datefce.c:425) + the months_between both-
    //    month-end rule (datefce.c:316) or01's mb31 didn't carry +
    //    bitand. Round thresholds, verbatim from the C switch:
    //    MON rounds up from the 16th; YYYY from July 1; Q from the 16th
    //    of the quarter's SECOND month; WW/DAY round within the week
    //    anchored at Jan 1 / Sunday, up from the 4th day. Week
    //    arithmetic rides epoch-day diffs against a Sunday anchor
    //    (1970-01-04), so both engines compute the identical integer —
    //    no engine dayofweek convention in the compared value. --
    "or03_ora_round_trunc" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .withColumn("od", to_date(col("o_orderdate")))
        .withColumn("zww", expr("datediff(od, trunc(od, 'YEAR')) % 7"))
        .withColumn("zday", expr("datediff(od, DATE'1970-01-04') % 7"))
        .select(
          col("o_orderkey"), col("od"),
          trunc(col("od"), "MM").as("t_mon"),
          when(dayofmonth(col("od")) >= 16, add_months(trunc(col("od"), "MM"), 1))
            .otherwise(trunc(col("od"), "MM")).as("r_mon"),
          trunc(col("od"), "YEAR").as("t_yr"),
          when(month(col("od")) >= 7, add_months(trunc(col("od"), "YEAR"), 12))
            .otherwise(trunc(col("od"), "YEAR")).as("r_yr"),
          trunc(col("od"), "QUARTER").as("t_q"),
          when(col("od") < date_add(add_months(trunc(col("od"), "QUARTER"), 1), 15),
            trunc(col("od"), "QUARTER"))
            .otherwise(add_months(trunc(col("od"), "QUARTER"), 3)).as("r_q"),
          expr("date_sub(od, zww)").as("t_ww"),
          expr("date_add(date_sub(od, zww), IF(zww < 4, 0, 7))").as("r_ww"),
          expr("date_sub(od, zday)").as("t_day"),
          expr("date_add(date_sub(od, zday), IF(zday < 4, 0, 7))").as("r_day"),
          // months_between(od, DATE'1997-06-30') — the ref IS a month
          // end, so the both-last-day integer rule fires iff od is one
          expr("""CAST(CASE WHEN od = last_day(od)
                    THEN ((year(od) - 1997) * 12 + month(od) - 6) * 31
                    ELSE (year(od) - 1997) * 372 + (month(od) - 6) * 31
                         + day(od) - 30 END AS BIGINT)""").as("mbme31"),
          expr("o_orderkey & 255").as("ba"))
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

    "or03_ora_round_trunc" -> """
      WITH src AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
        FROM orders WHERE o_custkey <= 50),
      z AS (
        SELECT o_orderkey, od,
          datediff('day', CAST(date_trunc('year', od) AS DATE), od) % 7 AS zww,
          datediff('day', DATE '1970-01-04', od) % 7 AS zday
        FROM src)
      SELECT o_orderkey, od,
        CAST(date_trunc('month', od) AS DATE) AS t_mon,
        CAST(CASE WHEN day(od) >= 16
          THEN date_trunc('month', od) + INTERVAL 1 MONTH
          ELSE date_trunc('month', od) END AS DATE) AS r_mon,
        CAST(date_trunc('year', od) AS DATE) AS t_yr,
        CAST(CASE WHEN month(od) >= 7
          THEN date_trunc('year', od) + INTERVAL 12 MONTH
          ELSE date_trunc('year', od) END AS DATE) AS r_yr,
        CAST(date_trunc('quarter', od) AS DATE) AS t_q,
        CAST(CASE WHEN od < CAST(date_trunc('quarter', od)
                     + INTERVAL 1 MONTH AS DATE) + 15
          THEN date_trunc('quarter', od)
          ELSE date_trunc('quarter', od) + INTERVAL 3 MONTH END AS DATE) AS r_q,
        od - CAST(zww AS INT) AS t_ww,
        od - CAST(zww AS INT) + CAST(CASE WHEN zww < 4 THEN 0 ELSE 7 END AS INT) AS r_ww,
        od - CAST(zday AS INT) AS t_day,
        od - CAST(zday AS INT) + CAST(CASE WHEN zday < 4 THEN 0 ELSE 7 END AS INT) AS r_day,
        CAST(CASE WHEN od = last_day(od)
          THEN ((year(od) - 1997) * 12 + month(od) - 6) * 31
          ELSE (year(od) - 1997) * 372 + (month(od) - 6) * 31
               + day(od) - 30 END AS BIGINT) AS mbme31,
        o_orderkey & 255 AS ba
      FROM z ORDER BY o_orderkey""",

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
