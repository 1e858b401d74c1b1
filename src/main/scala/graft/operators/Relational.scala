package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator inventory (SURVEY.md §2.1–§2.3, §2.6–§2.7):
  * scans with pushdown, filters, projections, hash/merge/nestloop joins in
  * every join type (inner, left/right/full outer, semi, anti, null-aware
  * anti, cross), sorts, top-k, limit/offset, set operations.
  *
  * Reference executor nodes covered here: nodeSeqscan.c, nodeResult.c,
  * nodeNestloop.c, nodeMergejoin.c, nodeHashjoin.c (incl. GP
  * JOIN_LASJ_NOTIN), nodeSort.c, nodeLimit.c, nodeAppend.c, nodeSetOp.c,
  * nodeUnique.c — all re-expressed as declarative Spark plans so Catalyst
  * picks broadcast vs shuffle strategies and AQE re-plans at runtime.
  *
  * Scale design: every dimension join (`region`, `nation`, `supplier`)
  * is broadcast (replicated ≙ the reference's DISTRIBUTED REPLICATED);
  * fact-fact joins shuffle on their equi-keys and survive a 1000-executor
  * scale-out unchanged. Filters are expressed on scan columns so they
  * reach the parquet reader as PushedFilters.
  */
object Relational {

  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  // Exact integer arithmetic for money: every price/discount/tax column is
  // a 2-decimal value, so sums run over BIGINT cents (order-independent —
  // identical in any engine) and convert to dollars only at the end.
  private val epCents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val discPct = "CAST(round(l_discount * 100) AS BIGINT)"
  private val taxPct = "CAST(round(l_tax * 100) AS BIGINT)"
  private val revenueExpr =
    s"round(CAST(sum($epCents * (100 - $discPct)) AS DOUBLE) / 10000.0, 2) AS revenue"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- TPC-H Q1: full-scan aggregate with partial/final split (nodeAgg.c) --
    "q01_pricing_summary" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= ts("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          expr(s"round(CAST(sum($epCents) AS DOUBLE) / 100.0, 2)").as("sum_base_price"),
          expr(s"round(CAST(sum($epCents * (100 - $discPct)) AS DOUBLE) / 10000.0, 2)").as("sum_disc_price"),
          expr(s"round(CAST(sum($epCents * (100 - $discPct) * (100 + $taxPct)) AS DOUBLE) / 1000000.0, 2)").as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          expr(s"round(CAST(sum($epCents) AS DOUBLE) / 100.0 / count(*), 6)").as("avg_price"),
          expr(s"round(CAST(sum($discPct) AS DOUBLE) / 100.0 / count(*), 6)").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // -- selective filter + projection: exercises parquet pushdown --
    "q02_filter_pushdown" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49.0 && col("l_discount") > 0.09)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // -- TPC-H Q3: 3-way join + agg + top-k (TakeOrderedAndProject) --
    "q03_shipping_priority" -> { (s, dir) =>
      val c = Tables.df(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.df(s, dir, "orders").filter(col("o_orderdate") < ts("1998-01-01"))
      val l = Tables.df(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(expr(revenueExpr).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // -- TPC-H Q5-style: 6-way star join, broadcast dims, shuffle facts --
    "q05_local_supplier_volume" -> { (s, dir) =>
      val c = Tables.df(s, dir, "customer")
      val o = Tables.df(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      val l = Tables.df(s, dir, "lineitem")
      val su = Tables.df(s, dir, "supplier")
      val n = Tables.df(s, dir, "nation")
      val r = Tables.df(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(expr(revenueExpr).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // -- TPC-H Q6: tight filter + global agg (single-row result) --
    "q06_revenue_delta" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
        .agg(expr(s"round(CAST(sum($epCents * $discPct) AS DOUBLE) / 10000.0, 2)").as("revenue"))
    },

    // -- left anti join (nodeHashjoin.c JOIN_ANTI): customers w/o orders --
    "q07_customers_without_orders" -> { (s, dir) =>
      val c = Tables.df(s, dir, "customer")
      val o = Tables.df(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    },

    // -- null-aware anti join (GP JOIN_LASJ_NOTIN → Spark NAAJ) --
    "q08_notin_suppliers" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey NOT IN (
          SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49.0 AND l_discount > 0.08)
        ORDER BY s_suppkey""")
    },

    // -- multi-way join + derived grouping (profit by nation/year) --
    "q09_profit_by_nation_year" -> { (s, dir) =>
      val l = Tables.df(s, dir, "lineitem")
      val o = Tables.df(s, dir, "orders")
      val su = Tables.df(s, dir, "supplier")
      val n = Tables.df(s, dir, "nation")
      val p = Tables.df(s, dir, "part").filter(col("p_name").contains("a"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(expr(s"round(CAST(sum($epCents * (100 - $discPct) - CAST(round(p_retailprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT) * 10) AS DOUBLE) / 10000.0, 2)").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // -- left outer join + agg over the preserved side --
    "q10_nation_customer_counts" -> { (s, dir) =>
      val n = Tables.df(s, dir, "nation")
      val c = Tables.df(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
      n.join(c, col("c_nationkey") === col("n_nationkey"), "left_outer")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_rich_customers"))
        .orderBy(col("n_nationkey"))
    },

    // -- right outer join (same semantics, exercises the plan shape) --
    "q11_right_join_suppliers" -> { (s, dir) =>
      val su = Tables.df(s, dir, "supplier").filter(col("s_acctbal") > 5000.0)
      val n = Tables.df(s, dir, "nation")
      su.join(n, col("s_nationkey") === col("n_nationkey"), "right_outer")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("s_suppkey")).as("n_suppliers"))
        .orderBy(col("n_nationkey"))
    },

    // -- full outer join of two aggregates (nodeMergejoin.c full-outer) --
    "q12_full_outer_activity" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
      val fulfilled = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("f_custkey")).agg(count(lit(1)).as("n_fulfilled"))
      val open = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("p_custkey")).agg(count(lit(1)).as("n_open"))
      fulfilled.join(open, col("f_custkey") === col("p_custkey"), "full_outer")
        .select(
          coalesce(col("f_custkey"), col("p_custkey")).as("custkey"),
          coalesce(col("n_fulfilled"), lit(0L)).as("n_fulfilled"),
          coalesce(col("n_open"), lit(0L)).as("n_open"))
        .orderBy(col("custkey"))
    },

    // -- cross join (nodeNestloop.c, no quals) --
    "q13_region_nation_matrix" -> { (s, dir) =>
      val r = Tables.df(s, dir, "region")
      val n = Tables.df(s, dir, "nation")
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"),
          (col("n_regionkey") === col("r_regionkey")).cast("int").as("is_home"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // -- DISTINCT aggregate (single DQA; cdbgroupingpaths.c 3-stage) --
    "q14_segment_distinct" -> { (s, dir) =>
      Tables.df(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"),
          expr("round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)").as("total_balance"))
        .orderBy(col("c_mktsegment"))
    },

    // -- multi-DQA (GP nodeTupleSplit.c ≙ Spark Expand + 2-phase agg) --
    "q15_multi_distinct" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          round(avg(col("l_quantity")), 6).as("avg_qty"))
        .orderBy(col("l_returnflag"))
    },

    // -- set ops: UNION ALL (nodeAppend.c) --
    "q16_union_all_parties" -> { (s, dir) =>
      val c = Tables.df(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"), lit("customer").as("party"))
      val su = Tables.df(s, dir, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"), lit("supplier").as("party"))
      c.unionByName(su)
        .groupBy(col("nationkey"), col("party"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"), col("party"))
    },

    // -- INTERSECT (nodeSetOp.c → ReplaceIntersectWithSemiJoin) --
    "q17_intersect_buyers" -> { (s, dir) =>
      val building = Tables.df(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
      val bigSpenders = Tables.df(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0).select(col("o_custkey").as("custkey"))
      building.intersect(bigSpenders).orderBy(col("custkey"))
    },

    // -- EXCEPT --
    "q18_except_nations" -> { (s, dir) =>
      val custNations = Tables.df(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
      val suppNations = Tables.df(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))
      custNations.except(suppNations).orderBy(col("nationkey"))
    },

    // -- EXCEPT ALL (multiset semantics) --
    "q19_except_all_flags" -> { (s, dir) =>
      val l = Tables.df(s, dir, "lineitem")
      val odd = l.filter(col("l_orderkey") % 2 === 1).select(col("l_returnflag").as("flag"))
      val even = l.filter(col("l_orderkey") % 2 === 0).select(col("l_returnflag").as("flag"))
      odd.exceptAll(even).groupBy(col("flag")).agg(count(lit(1)).as("n")).orderBy(col("flag"))
    },

    // -- DISTINCT (nodeUnique.c) --
    "q20_distinct_pairs" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // -- sort + limit/offset (nodeLimit.c LIMIT/OFFSET) --
    "q21_limit_offset" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(50).limit(100)
    },

    // -- HAVING (post-agg filter) --
    "q22_frequent_buyers" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          expr("round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)").as("spend"))
        .filter(col("n_orders") >= 18)
        .orderBy(col("o_custkey"))
    },

    // -- inline VALUES relation joined to a fact (nodeValuesscan.c) --
    "q23_priority_weights" -> { (s, dir) =>
      import s.implicits._
      val weights = Seq(
        ("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3), ("4-NOT SPECIFIED", 2), ("5-LOW", 1)
      ).toDF("priority", "weight")
      Tables.df(s, dir, "orders")
        .join(broadcast(weights), col("o_orderpriority") === col("priority"))
        .groupBy(col("priority"), col("weight"))
        .agg(count(lit(1)).as("n_orders"), sum(col("weight")).cast("bigint").as("weight_sum"))
        .orderBy(col("weight").desc)
    },

    // -- generated series source (FunctionScan ≙ spark.range) --
    "q24_series_buckets" -> { (s, dir) =>
      s.range(1, 10001).toDF("i")
        .groupBy((col("i") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("i")).as("total"))
        .orderBy(col("bucket"))
    },

    // -- deterministic systematic sample (key-mod predicate) --
    "q25_systematic_sample" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 13)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity),2) AS sum_qty,
        round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_base_price,
        round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
        round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000.0, 2) AS sum_charge,
        round(avg(l_quantity),6) AS avg_qty,
        round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 6) AS avg_price,
        round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 6) AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_quantity >= 49.0 AND l_discount > 0.09
      ORDER BY l_orderkey, l_linenumber""",

    "q03_shipping_priority" -> """
      SELECT l_orderkey, o_orderdate,
        round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q05_local_supplier_volume" -> """
      SELECT n_name, round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q06_revenue_delta" -> """
      SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""",

    "q07_customers_without_orders" -> """
      SELECT c_nationkey, count(*) AS n_customers
      FROM customer WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q08_notin_suppliers" -> """
      SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey NOT IN (
        SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49.0 AND l_discount > 0.08)
      ORDER BY s_suppkey""",

    "q09_profit_by_nation_year" -> """
      SELECT n_name AS nation, CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
        round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) - CAST(round(p_retailprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT) * 10) AS DOUBLE) / 10000.0, 2) AS profit
      FROM lineitem, orders, supplier, nation, part
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey AND l_partkey = p_partkey
        AND p_name LIKE '%a%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC""",

    "q10_nation_customer_counts" -> """
      SELECT n_nationkey, n_name, count(c_custkey) AS n_rich_customers
      FROM nation LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000.0) c
        ON c_nationkey = n_nationkey
      GROUP BY n_nationkey, n_name ORDER BY n_nationkey""",

    "q11_right_join_suppliers" -> """
      SELECT n_nationkey, n_name, count(s_suppkey) AS n_suppliers
      FROM (SELECT * FROM supplier WHERE s_acctbal > 5000.0) s RIGHT JOIN nation
        ON s_nationkey = n_nationkey
      GROUP BY n_nationkey, n_name ORDER BY n_nationkey""",

    "q12_full_outer_activity" -> """
      SELECT coalesce(f_custkey, p_custkey) AS custkey,
        coalesce(n_fulfilled, 0) AS n_fulfilled, coalesce(n_open, 0) AS n_open
      FROM (SELECT o_custkey AS f_custkey, count(*) AS n_fulfilled
            FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) f
      FULL OUTER JOIN
           (SELECT o_custkey AS p_custkey, count(*) AS n_open
            FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) p
        ON f_custkey = p_custkey
      ORDER BY custkey""",

    "q13_region_nation_matrix" -> """
      SELECT r_name, n_name,
        CAST(CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END AS INTEGER) AS is_home
      FROM region CROSS JOIN nation ORDER BY r_name, n_name""",

    "q14_segment_distinct" -> """
      SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        count(*) AS n_customers,
        round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total_balance
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q15_multi_distinct" -> """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_suppliers,
        count(DISTINCT l_orderkey) AS n_orders,
        round(avg(l_quantity),6) AS avg_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q16_union_all_parties" -> """
      SELECT nationkey, party, count(*) AS n FROM (
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey, 'customer' AS party FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS INTEGER) AS nationkey, 'supplier' AS party FROM supplier)
      GROUP BY nationkey, party ORDER BY nationkey, party""",

    "q17_intersect_buyers" -> """
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
      ORDER BY custkey""",

    "q18_except_nations" -> """
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      EXCEPT
      SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
      ORDER BY nationkey""",

    "q19_except_all_flags" -> """
      SELECT flag, count(*) AS n FROM (
        SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey % 2 = 1
        EXCEPT ALL
        SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey % 2 = 0)
      GROUP BY flag ORDER BY flag""",

    "q20_distinct_pairs" -> """
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",

    "q21_limit_offset" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 100 OFFSET 50""",

    "q22_frequent_buyers" -> """
      SELECT o_custkey, count(*) AS n_orders,
        round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 18 ORDER BY o_custkey""",

    "q23_priority_weights" -> """
      SELECT priority, weight, count(*) AS n_orders,
        CAST(sum(weight) AS BIGINT) AS weight_sum
      FROM orders JOIN (VALUES
        ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
        ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) AS w(priority, weight)
        ON o_orderpriority = priority
      GROUP BY priority, weight ORDER BY weight DESC""",

    "q24_series_buckets" -> """
      SELECT i % 7 AS bucket, count(*) AS n, CAST(sum(i) AS BIGINT) AS total
      FROM generate_series(1, 10000) t(i)
      GROUP BY 1 ORDER BY bucket""",

    "q25_systematic_sample" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      WHERE o_orderkey % 97 = 13 ORDER BY o_orderkey"""
  )
}
