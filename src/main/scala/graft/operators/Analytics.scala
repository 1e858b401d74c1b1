package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** OLAP analytics inventory (SURVEY.md §2.4–§2.5): window functions with
  * ROWS/RANGE frames, ranking/analytic functions, grouping sets / rollup /
  * cube (reference: nodeWindowAgg.c, nodeAgg.c grouping-set phases,
  * cdbgroupingpaths.c multi-stage agg), ordered-set aggregates
  * (orderedsetaggs.c → exact `percentile`), pivot, and deterministic mode.
  *
  * Scale design: every window partitions on a data column, never a global
  * single-partition window (which would serialize on one executor at
  * 100 TB). Grouping sets expand via Catalyst's Expand operator — the same
  * trick as GP's TupleSplit — and aggregate partially before the shuffle.
  */
object Analytics {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- ranking trio over partitions (windowfuncs.c) --
    "q30_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wTies = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      Tables.df(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"))
        .filter(col("rn") <= 10)
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    // -- distribution ranks (nodeWindowAgg.c WINDOW_PERCENT_RANK /
    //    CUME_DIST / NTILE — completes the ranking family next to q30's
    //    row_number/rank/dense_rank). percent_rank and cume_dist are
    //    rank-based so they tolerate peer ties; ntile rides the fully
    //    deterministic (acctbal, custkey) order --
    "q102_dist_ranks" -> { (s, dir) =>
      val wTies = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      val wUniq = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.df(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          round(percent_rank().over(wTies), 6).as("pct_rank"),
          round(cume_dist().over(wTies), 6).as("cume"),
          ntile(4).over(wUniq).cast("bigint").as("quartile"))
        .orderBy(col("c_mktsegment"), col("pct_rank"), col("c_custkey"))
    },

    // -- running sum, ROWS frame --
    "q31_running_spend" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round((sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).over(w).cast("double")) / 100.0, 2).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // -- RANGE frame with numeric offset --
    "q32_range_frame_peers" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
        .rangeBetween(-100L, 0L)
      Tables.df(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          count(lit(1)).over(w).as("peers_within_100"))
        .orderBy(col("c_custkey"))
    },

    // -- lag/lead over event streams --
    "q33_event_deltas" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.df(s, dir, "events")
        .filter(col("user_id") <= 30)
        .select(col("user_id"), col("event_id"),
          round(col("value"), 4).as("value"),
          round(lag(col("value"), 1).over(w), 4).as("prev_value"),
          round(lead(col("value"), 1).over(w), 4).as("next_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // -- ntile / percent_rank / cume_dist — via the scalable two-pass
    //    rank (WindowFrames.scalableRank, r17): o_orderstatus has THREE
    //    values, so the plain window spelling processes three fat
    //    partitions in three tasks however many executors exist — the
    //    canonical window anti-pattern at 100 TB (and measurably slower
    //    than DuckDB's intra-partition-parallel WindowAgg even at
    //    sf0.1: idle 0.951 vs 0.41 after, PROF_r17). The window ORDER
    //    BY is total (price, orderkey), so all three functions are
    //    pure arithmetic over (rank, n): percent_rank = (r−1)/(n−1),
    //    cume_dist = r/n, ntile by the remainder formula --
    "q34_order_quartiles" -> { (s, dir) =>
      WindowFrames.scalableRank(
        Tables.df(s, dir, "orders"),
        part = Seq("o_orderstatus"), order = Seq("o_totalprice", "o_orderkey"),
        rankCol = "rnk", cntCol = "n")
        .withColumn("sz", expr("n div 4"))
        .withColumn("rem", expr("n % 4"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("""CAST(CASE WHEN rnk <= rem * (sz + 1)
                    THEN (rnk + sz) div (sz + 1)
                    ELSE rem + ((rnk - rem * (sz + 1)) + sz - 1) div sz
                  END AS INT)""").as("quartile"),
          round(when(col("n") > 1,
            (col("rnk") - 1).cast("double") / (col("n") - 1).cast("double"))
            .otherwise(lit(0.0)), 9).as("pct_rank"),
          round(col("rnk").cast("double") / col("n").cast("double"), 9).as("cdist"))
        .orderBy(col("o_orderkey"))
    },

    // -- first/last/nth value with full-partition frame --
    "q35_first_last_order" -> { (s, dir) =>
      val wFull = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wRn = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.df(s, dir, "orders")
        .select(col("o_custkey"),
          row_number().over(wRn).as("rn"),
          first(col("o_orderkey")).over(wFull).as("first_order"),
          last(col("o_orderkey")).over(wFull).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("first_order"), col("last_order"), col("second_order"))
        .orderBy(col("o_custkey"))
    },

    // -- top-k per group via window + filter --
    "q36_top_parts_per_brand" -> { (s, dir) =>
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.df(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("p_brand"), col("rn"))
    },

    // -- IGNORE NULLS window variants (windowfuncs.c lead/lag/nth_value
    //    null-treatment clause): carry-forward of the last non-null
    //    observation — the gap-fill idiom over sparse measures --
    "q89_ignore_nulls" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wSoFar = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 200)
        .withColumn("fcents",
          expr("CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END"))
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("fcents"), 1, null, ignoreNulls = true).over(w).as("prev_f"),
          last(col("fcents"), ignoreNulls = true).over(wSoFar).as("fill_f"),
          nth_value(col("fcents"), 2, ignoreNulls = true).over(wFull).as("second_f"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // -- GROUPING SETS with GROUPING() ids (nodeAgg.c phases) --
    "q37_grouping_sets" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(grouping(l_returnflag) AS INT) AS g_flag,
          CAST(grouping(l_linestatus) AS INT) AS g_status,
          round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
    },

    // -- ROLLUP via DataFrame API --
    "q38_rollup_orders" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          expr("round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // -- CUBE via DataFrame API --
    "q39_cube_lineitem" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // -- exact percentiles (ordered-set aggs, interpolate.c) --
    "q40_quantity_percentiles" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT l_returnflag,
          round(percentile(l_quantity, 0.25), 6) AS p25,
          round(percentile(l_quantity, 0.5), 6) AS p50,
          round(percentile(l_quantity, 0.75), 6) AS p75,
          round(percentile(l_quantity, 0.9), 6) AS p90,
          min(l_quantity) AS qmin, max(l_quantity) AS qmax
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },

    // -- deterministic mode (most frequent value, ties → smallest) --
    "q41_quantity_mode" -> { (s, dir) =>
      val counts = Tables.df(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("cnt").desc, col("l_quantity"))
      counts.select(col("l_returnflag"), col("l_quantity"), col("cnt"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt").as("mode_count"))
        .orderBy(col("l_returnflag"))
    },

    // -- PIVOT (gp pivot.c ≙ groupBy().pivot()) --
    "q42_pivot_status" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy(col("l_returnflag"))
    },

    // -- ct01: crosstab(source_sql, category_sql) — the FIXED-CATEGORY
    //    pivot of contrib/tablefunc (`tablefunc.c:638 crosstab_hash`,
    //    doc'd at :320): the output column set comes from the CALLER's
    //    category list, not from scanning the data, cells with no source
    //    row are NULL, and a category that never occurs yields an
    //    all-NULL column (p9 below). Spark-first: groupBy().pivot(col,
    //    EXPLICIT values) — the explicit list is exactly the category
    //    SQL, and skipping the values-discovery pass is also the scale
    //    win (one scan, no distinct shuffle). Cents stay BIGINT so the
    //    cells are exact in both engines --
    "ct01_crosstab" -> { (s, dir) =>
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW", "9-PHANTOM")
      val named = Seq("p1", "p2", "p3", "p4", "p5", "p9")
      val piv = Tables.df(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .groupBy(col("o_custkey"))
        .pivot("o_orderpriority", prios)
        .agg(sum(col("cents")))
      prios.zip(named).foldLeft(piv) { case (df, (v, n)) => df.withColumnRenamed(v, n) }
        .orderBy(col("o_custkey"))
    },

    // -- ct02: crosstab(text) — the DYNAMIC-category variant ad-hoc
    //    users reach for first (contrib/tablefunc `tablefunc.c:396`
    //    crosstab; ct01 is the fixed-category crosstab_hash at :638):
    //    the output column set is DISCOVERED from the data in a first
    //    pass (distinct categories, ordered), then fed to the pivot.
    //    Spark-first: groupBy().pivot(col) with NO value list runs
    //    exactly that two-pass plan — a distinct+sort job over the
    //    category column (vocabulary-sized, broadcastable at any corpus
    //    size), then the one-scan pivot aggregate. The discovery pass
    //    is the price of not knowing the columns — which is why ct01's
    //    fixed-list form stays the scale default. Cells stay BIGINT so
    //    both engines agree exactly --
    "ct02_crosstab_dynamic" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .filter(col("user_id") <= 50)
        .withColumn("cents", expr("CAST(round(value * 10000) AS BIGINT)"))
        .groupBy(col("user_id"))
        .pivot("event_type") // discovery pass: distinct categories, ordered
        .agg(sum(col("cents")))
        .orderBy(col("user_id"))
    },

    // -- FILTER'd aggregates (conditional aggregation) --
    "q43_conditional_agg" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
          expr("round(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS DOUBLE) / 10000.0, 4)").as("purchase_value"),
          round(max(when(col("event_type") === "click", col("value"))), 4).as("max_click"))
        .orderBy(col("user_id"))
    },

    // -- q110: FILTER'd WINDOW aggregates (nodeWindowAgg.c + FILTER) --
    // PG/DuckDB allow `agg(x) FILTER (WHERE p) OVER w`; Spark's window
    // aggregates take no FILTER clause, so the dialect translation is the
    // CASE-inside-agg rewrite (NULLs are skipped by sum/count, matching
    // FILTER semantics — including the all-filtered prefix staying NULL).
    // Cents-integer discipline keeps the running sums exact: DuckDB
    // evaluates window sums over a segment tree, so a DOUBLE running sum
    // would drift last-ulp from Spark's sequential accumulation.
    "q110_window_filter" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT o_custkey, o_orderkey,
          CAST(sum(CASE WHEN o_orderstatus = 'F'
                        THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
            AS f_cents_run,
          CAST(count(CASE WHEN o_orderpriority LIKE '1%' THEN 1 END)
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
            AS urgent_run
        FROM orders ORDER BY o_custkey, o_orderkey""")
    },

    // -- scalar subquery threshold (SubPlan → Catalyst subquery) --
    "q44_above_avg_parts" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT p_partkey, p_brand, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.5 FROM part)
        ORDER BY p_partkey""")
    },

    // -- correlated scalar subquery (TPC-H Q17 shape) --
    "q45_small_quantity_revenue" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly
        FROM lineitem l1
        WHERE l1.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey)""")
    },

    // -- IN subquery (semi-join rewrite) --
    "q46_in_subquery" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem WHERE l_quantity >= 50.0 AND l_discount >= 0.09)
        ORDER BY s_suppkey""")
    },

    // -- EXISTS correlated (semi join) --
    "q47_exists_priority" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
      val hot = Tables.df(s, dir, "lineitem")
        .filter(col("l_discount") > 0.06 && col("l_quantity") > 45.0)
        .select(col("l_orderkey"))
      o.join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // -- q111: relational division (the ÷ operator) --
    // "Customers who ordered in EVERY priority class" — Codd's division,
    // which PG plans as nested NOT EXISTS SubPlans (subselect.c SubLink
    // handling; the oracle runs exactly that shape). The Spark-first
    // rendition is the set-cover-by-counting rewrite: |distinct divisor
    // values per candidate| == |divisor| — two map-side-combinable
    // distinct aggregates and a broadcast of the 1-row divisor count, no
    // correlated re-execution per outer row. Same answer, and the plan
    // scales as two hash aggregates of the fact table instead of a
    // per-customer probe.
    "q111_relational_division" -> { (s, dir) =>
      val orders = Tables.df(s, dir, "orders")
      val div = orders.agg(countDistinct(col("o_orderpriority")).as("n_pri"))
      val per = orders.groupBy(col("o_custkey"))
        .agg(countDistinct(col("o_orderpriority")).as("n_cust_pri"))
      per.crossJoin(broadcast(div))
        .filter(col("n_cust_pri") === col("n_pri"))
        .join(Tables.df(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // -- TPC-H Q21 shape: correlated EXISTS + NOT EXISTS on the same
    //    fact (semi join + anti join stacked, nodeSubplan.c territory):
    //    suppliers whose returned ('R') lineitems were the ONLY returns
    //    of a multi-supplier order (this schema has no receipt/commit
    //    dates, so returnflag plays the "late" role) --
    "q75_waiting_suppliers" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name""")
    },

    // -- string expression battery (varlena.c / oracle_compat.c) --
    "q48_string_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          length(col("c_name")).cast("int").as("name_len"),
          substring(col("c_name"), 1, 8).as("prefix"),
          concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("tag"),
          ltrim(rtrim(col("c_name"))).as("trimmed"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          (col("c_name").like("%1%")).cast("int").as("has_one"))
        .orderBy(col("c_custkey"))
    },

    // -- date/time expression battery (timestamp.c, date.c) --
    "q49_date_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("int").as("o_year"),
          quarter(col("o_orderdate")).cast("int").as("o_quarter"))
        .agg(
          count(lit(1)).as("n"),
          min(date_trunc("month", col("o_orderdate"))).as("first_month"),
          max(last_day(col("o_orderdate"))).as("last_day_max"))
        .orderBy(col("o_year"), col("o_quarter"))
    },

    // -- math expression battery (float.c / numeric behaviors) --
    // -- width_bucket histogram (PG numeric.c width_bucket_numeric): the
    //    equal-width bucketing primitive behind histogram ops. Spark runs
    //    the native width_bucket expression; the oracle expands PG's
    //    definition (bucket = floor((v-lo)/width)+1, clamped to 0 and
    //    count+1) arithmetically, so the check validates the expression
    //    against its own spec --
    "q106_width_bucket" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .select(expr("width_bucket(o_totalprice, 0.0, 600000.0, 8)").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("bucket"))
    },

    // -- string-algebra battery #2 (varlena.c: textoverlay, translate,
    //    initcap, repeat, reverse, split_part). overlay/initcap have no
    //    DuckDB builtin, so the oracle derives them from substring
    //    concatenation and per-word casing — independent formulations
    //    that must agree --
    "q107_string_algebra" -> { (s, dir) =>
      Tables.df(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(
          col("c_custkey"),
          expr("overlay(c_name PLACING 'XX' FROM 3 FOR 2)").as("overlaid"),
          translate(col("c_name"), "0123456789", "##########").as("digits_masked"),
          initcap(lower(col("c_mktsegment"))).as("segment_title"),
          expr("repeat(substring(c_name, 1, 2), 3)").as("rep2x3"),
          reverse(col("c_name")).as("rev_name"),
          expr("split_part(c_name, '#', 2)").as("name_num"))
        .orderBy(col("c_custkey"))
    },

    // -- boolean aggregates (bool_and / bool_or ≙ PG's every()/any
    //    semantics, src/backend/utils/adt/bool.c booland_statefunc) --
    "q108_bool_aggs" -> { (s, dir) =>
      Tables.df(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          expr("bool_and(c_acctbal > -999)").as("all_above_floor"),
          expr("bool_or(c_acctbal > 9000)").as("any_high"),
          expr("bool_and(c_custkey >= 0)").as("keys_nonneg"),
          count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    },

    "q50_math_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "part")
        .filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          round(abs(col("p_retailprice") - 1000.0), 6).as("abs_dev"),
          ceil(col("p_retailprice")).cast("bigint").as("ceiled"),
          floor(col("p_retailprice")).cast("bigint").as("floored"),
          round(sqrt(col("p_retailprice")), 9).as("sq"),
          round(log(col("p_retailprice")), 9).as("ln_price"),
          round(pow(col("p_size").cast("double"), 2.0), 6).as("size_sq"),
          (col("p_partkey") % 10).cast("int").as("mod10"),
          signum(col("p_retailprice") - 1000.0).cast("int").as("sgn"))
        .orderBy(col("p_partkey"))
    },

    // -- linear-regression aggregate family (PG regr_slope / regr_intercept
    //    / regr_r2 / corr, `src/backend/utils/adt/float.c` float8_regr_*).
    //    The native FP aggregates are summation-order-dependent, so the
    //    moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as exact
    //    DECIMAL(38,0) over integer-scaled inputs — order-independent
    //    across engines and partitionings — and only the closed-form
    //    formulas run in double, identically on both sides --
    "q84_regr_family" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .withColumn("x", expr("CAST(round(l_quantity) AS BIGINT)"))
        .withColumn("y", expr("CAST(round(l_extendedprice) AS BIGINT)"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          expr("sum(CAST(x AS DECIMAL(38,0)))").as("sx"),
          expr("sum(CAST(y AS DECIMAL(38,0)))").as("sy"),
          expr("sum(CAST(x * y AS DECIMAL(38,0)))").as("sxy"),
          expr("sum(CAST(x * x AS DECIMAL(38,0)))").as("sxx"),
          expr("sum(CAST(y * y AS DECIMAL(38,0)))").as("syy"))
        .select(
          col("l_returnflag"), col("n"),
          round(expr("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 9)
            .as("slope"),
          round(expr("""(CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                        / CAST(n AS DOUBLE)"""), 6).as("intercept"),
          round(expr("""pow((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 2)"""), 9)
            .as("r2"),
          round(expr("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 9)
            .as("corr"))
        .orderBy(col("l_returnflag"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q84_regr_family" -> """
      WITH m AS (
        SELECT l_returnflag, count(*) AS n,
          sum(CAST(x AS DECIMAL(38,0))) AS sx,
          sum(CAST(y AS DECIMAL(38,0))) AS sy,
          sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
          sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
          sum(CAST(y * y AS DECIMAL(38,0))) AS syy
        FROM (SELECT l_returnflag,
                CAST(round(l_quantity) AS BIGINT) AS x,
                CAST(round(l_extendedprice) AS BIGINT) AS y
              FROM lineitem) t
        GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS slope,
        round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
              / CAST(n AS DOUBLE), 6) AS intercept,
        round(pow((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 2), 9) AS r2,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS corr
      FROM m ORDER BY l_returnflag""",

    "q75_waiting_suppliers" -> """
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_returnflag = 'R'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name""",

    "q102_dist_ranks" -> """
      SELECT c_custkey, c_mktsegment,
        round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC), 6) AS pct_rank,
        round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC), 6) AS cume,
        CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
      FROM customer
      ORDER BY c_mktsegment, pct_rank, c_custkey""",

    "q30_window_rank" -> """
      SELECT * FROM (
        SELECT c_custkey, c_mktsegment, c_acctbal,
          row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
          rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
          dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk
        FROM customer) t
      WHERE rn <= 10 ORDER BY c_mktsegment, rn""",

    "q31_running_spend" -> """
      SELECT o_custkey, o_orderkey,
        round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0, 2) AS running_spend
      FROM orders WHERE o_custkey <= 100
      ORDER BY o_custkey, o_orderkey""",

    "q32_range_frame_peers" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal,
        count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS peers_within_100
      FROM customer ORDER BY c_custkey""",

    "q33_event_deltas" -> """
      SELECT user_id, event_id, round(value, 4) AS value,
        round(lag(value, 1) OVER w, 4) AS prev_value,
        round(lead(value, 1) OVER w, 4) AS next_value
      FROM events WHERE user_id <= 30
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",

    "q34_order_quartiles" -> """
      SELECT o_orderkey, o_orderstatus,
        ntile(4) OVER w AS quartile,
        round(percent_rank() OVER w, 9) AS pct_rank,
        round(cume_dist() OVER w, 9) AS cdist
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""",

    "q35_first_last_order" -> """
      SELECT o_custkey, first_order, last_order, second_order FROM (
        SELECT o_custkey,
          row_number() OVER w2 AS rn,
          first_value(o_orderkey) OVER w AS first_order,
          last_value(o_orderkey) OVER w AS last_order,
          nth_value(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
          w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) t
      WHERE rn = 1 ORDER BY o_custkey""",

    // DuckDB spells the null-treatment clause inside the call parens
    "q89_ignore_nulls" -> """
      SELECT o_custkey, o_orderkey,
        lag(fcents IGNORE NULLS) OVER w AS prev_f,
        last_value(fcents IGNORE NULLS) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_f,
        nth_value(fcents, 2 IGNORE NULLS) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_f
      FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
          CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END AS fcents
        FROM orders WHERE o_custkey <= 200)
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "q36_top_parts_per_brand" -> """
      SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) t
      WHERE rn <= 3 ORDER BY p_brand, rn""",

    "q37_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
        round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY g_flag, g_status, l_returnflag, l_linestatus""",

    "q38_rollup_orders" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q39_cube_lineitem" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q40_quantity_percentiles" -> """
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        min(l_quantity) AS qmin, max(l_quantity) AS qmax
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q41_quantity_mode" -> """
      SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count FROM (
        SELECT l_returnflag, l_quantity, count(*) AS cnt,
          row_number() OVER (PARTITION BY l_returnflag ORDER BY count(*) DESC, l_quantity) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity) t
      WHERE rn = 1 ORDER BY l_returnflag""",

    "q42_pivot_status" -> """
      SELECT l_returnflag,
        round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS "F",
        round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS "O"
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "ct01_crosstab" -> """
      WITH src AS (
        SELECT o_custkey, o_orderpriority,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_custkey <= 50)
      SELECT o_custkey,
        CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN cents END) AS BIGINT) AS p1,
        CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN cents END) AS BIGINT) AS p2,
        CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN cents END) AS BIGINT) AS p3,
        CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN cents END) AS BIGINT) AS p4,
        CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN cents END) AS BIGINT) AS p5,
        CAST(NULL AS BIGINT) AS p9
      FROM src GROUP BY o_custkey ORDER BY o_custkey""",

    // DuckDB's own dynamic PIVOT re-derives the discovery + pivot; the
    // COLUMNS cast pins the HUGEINT sums back to BIGINT for the compare
    "ct02_crosstab_dynamic" -> """
      WITH src AS (
        SELECT user_id, event_type, CAST(round(value * 10000) AS BIGINT) AS cents
        FROM events WHERE user_id <= 50)
      SELECT user_id, CAST(COLUMNS(* EXCLUDE (user_id)) AS BIGINT)
      FROM (PIVOT src ON event_type USING sum(cents) GROUP BY user_id)
      ORDER BY user_id""",

    "q43_conditional_agg" -> """
      SELECT user_id, count(*) AS n_events,
        count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        round(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS DOUBLE) / 10000.0, 4) AS purchase_value,
        round(max(value) FILTER (WHERE event_type = 'click'), 4) AS max_click
      FROM events GROUP BY user_id ORDER BY user_id""",

    // native FILTER-on-window syntax — the surface Spark rewrites via CASE
    "q110_window_filter" -> """
      SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          FILTER (WHERE o_orderstatus = 'F')
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
          AS f_cents_run,
        CAST(count(*) FILTER (WHERE o_orderpriority LIKE '1%')
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
          AS urgent_run
      FROM orders ORDER BY o_custkey, o_orderkey""",

    "q44_above_avg_parts" -> """
      SELECT p_partkey, p_brand, p_retailprice FROM part
      WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.5 FROM part)
      ORDER BY p_partkey""",

    "q45_small_quantity_revenue" -> """
      SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly
      FROM lineitem l1
      WHERE l1.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey)""",

    "q46_in_subquery" -> """
      SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem WHERE l_quantity >= 50.0 AND l_discount >= 0.09)
      ORDER BY s_suppkey""",

    // the textbook double-NOT-EXISTS division the Spark side re-expresses
    // by counting
    "q111_relational_division" -> """
      SELECT c.c_custkey, c.c_name
      FROM customer c
      WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) d
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = d.o_orderpriority))
      ORDER BY c.c_custkey""",

    "q47_exists_priority" -> """
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_discount > 0.06 AND l_quantity > 45.0)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q48_string_funcs" -> """
      SELECT c_custkey,
        upper(c_name) AS uname,
        lower(c_mktsegment) AS lseg,
        CAST(length(c_name) AS INTEGER) AS name_len,
        substring(c_name, 1, 8) AS prefix,
        c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS tag,
        ltrim(rtrim(c_name)) AS trimmed,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
        CAST(CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS INTEGER) AS has_one
      FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",

    "q49_date_funcs" -> """
      SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
        CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
        count(*) AS n,
        min(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS first_month,
        max(CAST(last_day(o_orderdate) AS DATE)) AS last_day_max
      FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter""",

    // width_bucket expanded per PG's spec: equal-width buckets over
    // [lo, hi), below-range -> 0, at-or-above hi -> count+1
    "q106_width_bucket" -> """
      WITH b AS (
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 600000 THEN 9
                         ELSE floor(o_totalprice / 75000) + 1 END AS BIGINT) AS bucket,
               o_totalprice
        FROM orders)
      SELECT bucket, count(*) AS n,
             round(min(o_totalprice), 2) AS min_price,
             round(max(o_totalprice), 2) AS max_price
      FROM b GROUP BY bucket ORDER BY bucket""",

    // overlay := substr(1, pos-1) || replacement || substr(pos+len);
    // initcap := per-word upper(first) || lower(rest)
    "q107_string_algebra" -> """
      SELECT c_custkey,
        substring(c_name, 1, 2) || 'XX' || substring(c_name, 5) AS overlaid,
        translate(c_name, '0123456789', '##########') AS digits_masked,
        list_aggregate(list_transform(string_split(lower(c_mktsegment), ' '),
          w -> upper(substring(w, 1, 1)) || substring(w, 2)), 'string_agg', ' ')
          AS segment_title,
        repeat(substring(c_name, 1, 2), 3) AS rep2x3,
        reverse(c_name) AS rev_name,
        split_part(c_name, '#', 2) AS name_num
      FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",

    "q108_bool_aggs" -> """
      SELECT c_mktsegment,
        bool_and(c_acctbal > -999) AS all_above_floor,
        bool_or(c_acctbal > 9000) AS any_high,
        bool_and(c_custkey >= 0) AS keys_nonneg,
        count(*) AS n
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q50_math_funcs" -> """
      SELECT p_partkey,
        round(abs(p_retailprice - 1000.0), 6) AS abs_dev,
        CAST(ceil(p_retailprice) AS BIGINT) AS ceiled,
        CAST(floor(p_retailprice) AS BIGINT) AS floored,
        round(sqrt(p_retailprice), 9) AS sq,
        round(ln(p_retailprice), 9) AS ln_price,
        round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq,
        CAST(p_partkey % 10 AS INTEGER) AS mod10,
        CAST(sign(p_retailprice - 1000.0) AS INTEGER) AS sgn
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey"""
  )
}
