package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The full TPC-H query battery (the shapes BASELINE.md publishes
  * per-query reference times for, `contrib/pax_storage/doc/performance.md:
  * 34-56`): Q2-Q22 explicitly here, Q1 as q01_pricing_summary in
  * Relational (the flagship). Round 7 added Q3/Q5/Q6/Q9/Q21 so every
  * published query lines up against a same-named `queries` entry.
  *
  * Q3/Q5/Q6/Q9/Q21 shapes also exist as DataFrame-API formulations
  * (q03/q05/q06/q09/q75 in Relational/Analytics) — those exercise the
  * Dataset builder path with explicit broadcast() hints; the h-versions
  * here go through the SQL parser with NO hints, so AQE must discover
  * the broadcasts and Catalyst must decorrelate the subqueries itself
  * (h21's textbook double-EXISTS with non-equi date-lateness
  * correlation vs q75's returnflag proxy). Two deliberate paths into
  * the same plan shapes, not duplicates.
  *
  * Adaptations to the driver's trimmed schema (TESTDATA.md has no
  * partsupp, l_commitdate/l_receiptdate/l_shipmode, c_phone, p_container):
  *  - partsupp-derived values (Q2 supply cost, Q11 stock value, Q16
  *    supplier counts, Q20 availability) are re-derived from lineitem —
  *    the JOIN/subquery shape each query exists to exercise is unchanged.
  *  - Q4/Q12/Q21's commit-vs-receipt lateness becomes ship-vs-order
  *    lateness (Q21 keeps its double-correlated EXISTS / NOT EXISTS).
  *  - Q9's ps_supplycost becomes 60% of p_retailprice (fixed margin), and
  *    its o_shippriority analog in Q3 is o_orderpriority.
  *  - Q22's phone-prefix country code becomes c_nationkey.
  *
  * Each query is ONE SQL text shared verbatim between the Spark plan and
  * the DuckDB oracle (both engines accept the dialect used), so the
  * correctness gate can never drift from the benched plan. This also makes
  * the battery the workout for Catalyst's subquery decorrelation
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery — the ORCA
  * analog is CSubqueryHandler, reference
  * `src/backend/gporca/libgpopt/src/xforms/CXformUtils.cpp`): h02/h17
  * carry correlated scalar aggregates, h04/h22 correlated EXISTS/NOT
  * EXISTS, h18/h20 IN-subqueries with grouped HAVING, h11/h15/h20/h22
  * uncorrelated scalar subqueries.
  *
  * Scale notes (the plans Catalyst + AQE produce at these shapes):
  *  - every nation/region/supplier join auto-broadcasts under AQE (the
  *    reference replicates the same dims, `gp_distribution_policy.h`);
  *  - fact-fact joins (orders⋈lineitem, customer⋈orders) shuffle on their
  *    keys and survive a 1000-executor scale-out unchanged;
  *  - money aggregates run over BIGINT cents (order-independent across
  *    engines and partitionings), converting to dollars only at the end.
  */
object TpcH {

  private val epc = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val dpc = "CAST(round(l_discount * 100) AS BIGINT)"
  private val revC = s"sum($epc * (100 - $dpc))"

  /** name -> SQL text shared by the Spark run and the DuckDB oracle. */
  val sqlText: Map[String, String] = Map(
    // Q2: min-cost supplier. Supply cost := cheapest observed sale price
    // of the part by the supplier (partsupp.ps_supplycost analog derived
    // from lineitem). TPC-H's correlated scalar MIN is expressed as a
    // window-min over the EUROPE-filtered cost relation (r6 verdict #7):
    // Spark does not share a non-cached CTE across a correlated-subquery
    // boundary, so the textbook form aggregated lineitem TWICE (2.4 s at
    // sf0.1, the slowest battery query). The window form derives `cost`
    // once — ONE lineitem aggregation in the physical plan (asserted in
    // PlanShapeSpec). The selective part predicate (p_size/p_type keeps
    // ~4% of parts) is applied BELOW that aggregation via the `pk` CTE:
    // the window min is per-partkey, so restricting to the partkeys that
    // can appear in the output cannot change any surviving row — and the
    // broadcast-semi-join of the filtered part list cuts the aggregated
    // lineitem volume ~27× (the same static pruning ORCA gets from
    // pushing the select below the GbAgg, CXformPushGbBelowJoin).
    // Equivalent semantics for the correlated min: it ranged over all
    // EUROPE suppliers of p_partkey, exactly this window's frame.
    "h02_min_cost_supplier" -> s"""
      WITH pk AS (
        SELECT p_partkey, p_name FROM part
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'),
      cost AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey, min($epc) AS cost_cents
        FROM lineitem, pk WHERE l_partkey = p_partkey GROUP BY 1, 2),
      eur AS (
        SELECT partkey, cost_cents, s_acctbal, s_name, n_name,
               min(cost_cents) OVER (PARTITION BY partkey) AS min_cost
        FROM cost, supplier, nation, region
        WHERE s_suppkey = suppkey AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             round(CAST(cost_cents AS DOUBLE) / 100.0, 2) AS supply_cost
      FROM pk, eur
      WHERE p_partkey = partkey AND cost_cents = min_cost
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    // Q3: shipping priority — segment-filtered 3-way join, grouped
    // revenue, top-10 by revenue. o_shippriority is not in the trimmed
    // schema; o_orderpriority plays its role in the projection.
    "h03_shipping_priority" -> s"""
      SELECT l_orderkey,
             round(CAST($revC AS DOUBLE) / 10000.0, 2) AS revenue,
             o_orderdate, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1997-03-15'
        AND l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",

    // Q5: local supplier volume — 6-way join closed by the c_nationkey =
    // s_nationkey "local" edge (the cycle is what the query exercises:
    // the join graph is not a tree, so the optimizer must pick which
    // edge to leave as a filter).
    "h05_local_supplier_volume" -> s"""
      SELECT n_name, round(CAST($revC AS DOUBLE) / 10000.0, 2) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    // Q6: forecast revenue change — pure scan + filter + ungrouped agg
    // (the canonical pushdown/vectorization microbenchmark). The
    // discount band runs on integer cents (dpc BETWEEN 5 AND 7), not a
    // float BETWEEN 0.05 AND 0.07, so the band edges are exact in both
    // engines. revenue := extendedprice * discount = epc*dpc / 10^4.
    "h06_forecast_revenue" -> s"""
      SELECT round(CAST(sum($epc * $dpc) AS DOUBLE) / 10000.0, 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND $dpc BETWEEN 5 AND 7 AND l_quantity < 24""",

    // Q9: product type profit — 5-way join grouped by supplier nation ×
    // order year. Supply cost := 60% of p_retailprice (fixed-margin
    // partsupp analog), kept in integer units: both terms of the profit
    // are scaled to cent×100 (amount_c = epc*(100-dpc); cost side
    // retail_cents * 60 * qty) so the subtraction is exact.
    "h09_product_type_profit" -> s"""
      WITH profit AS (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               $epc * (100 - $dpc)
                 - CAST(round(p_retailprice * 100) AS BIGINT) * 60 * CAST(l_quantity AS BIGINT)
                 AS amount_c
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%gear%')
      SELECT nation, o_year,
             round(CAST(sum(amount_c) AS DOUBLE) / 10000.0, 2) AS sum_profit
      FROM profit GROUP BY nation, o_year
      ORDER BY nation, o_year DESC""",

    // Q21: suppliers who kept orders waiting — the battery's hardest
    // subquery shape: a correlated EXISTS and a correlated NOT EXISTS
    // over the same fact, each correlated on BOTH l1.l_orderkey and a
    // non-equi lateness predicate against the outer order's date
    // (Catalyst: one LeftSemi + one LeftAnti after
    // RewritePredicateSubquery; ORCA: CSubqueryHandler anti-semijoin
    // pair). Lateness := shipped >= 45 days after order date.
    "h21_suppliers_kept_waiting" -> """
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate >= o_orderdate + INTERVAL 45 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate >= o_orderdate + INTERVAL 45 DAY)
        AND s_nationkey = n_nationkey
        AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",

    // Q4: order priority checking — correlated EXISTS (semi-join) + agg.
    "h04_order_priority" -> """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // Q7: volume shipping between two regions — double nation join with a
    // symmetric OR pair filter.
    "h07_volume_shipping" -> s"""
      WITH shipping AS (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year, $epc * (100 - $dpc) AS volume_c
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND ((n1.n_regionkey = 1 AND n2.n_regionkey = 2)
            OR (n1.n_regionkey = 2 AND n2.n_regionkey = 1))
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01')
      SELECT supp_nation, cust_nation, l_year,
             round(CAST(sum(volume_c) AS DOUBLE) / 10000.0, 2) AS revenue
      FROM shipping GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // Q8: national market share — 8-way join, conditional-sum ratio.
    "h08_market_share" -> s"""
      WITH all_nations AS (
        SELECT year(o_orderdate) AS o_year, $epc * (100 - $dpc) AS volume_c,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
          AND p_type = 'ECONOMY')
      SELECT o_year,
             round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_c ELSE 0 END) AS DOUBLE)
                   / CAST(sum(volume_c) AS DOUBLE), 6) AS mkt_share
      FROM all_nations GROUP BY o_year ORDER BY o_year""",

    // Q10: returned-item reporting — 4-way join, agg, top 20.
    "h10_returned_items" -> s"""
      SELECT c_custkey, c_name, round(CAST($revC AS DOUBLE) / 10000.0, 2) AS revenue,
             c_acctbal, n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""",

    // Q11: important stock — CTE aggregated twice, scalar-subquery HAVING
    // threshold (stock value := lineitem sales value of the part).
    "h11_important_stock" -> s"""
      WITH val AS (
        SELECT l_partkey AS partkey,
               sum($epc * CAST(l_quantity AS BIGINT)) AS value_c
        FROM lineitem, supplier
        WHERE l_suppkey = s_suppkey AND s_nationkey < 8
        GROUP BY l_partkey)
      SELECT partkey, round(CAST(value_c AS DOUBLE) / 100.0, 2) AS part_value
      FROM val
      WHERE value_c > (SELECT sum(value_c) * 0.001 FROM val)
      ORDER BY value_c DESC, partkey""",

    // Q12: shipping classes vs priority — join + conditional two-way counts
    // (lateness := shipped >= 30 days after order date).
    "h12_priority_shipclass" -> """
      SELECT l_returnflag AS ship_class,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1 ORDER BY 1""",

    // Q13: customer order-count distribution — outer join with an ON-clause
    // filter, then a second aggregation over the first.
    "h13_customer_distribution" -> """
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    // Q14: promo revenue ratio — join + CASE'd aggregate ratio.
    "h14_promo_revenue" -> s"""
      SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $epc * (100 - $dpc) ELSE 0 END) AS DOUBLE)
                   / CAST(sum($epc * (100 - $dpc)) AS DOUBLE), 6) AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""",

    // Q15: top supplier — CTE view + uncorrelated scalar MAX equality.
    "h15_top_supplier" -> s"""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no, $revC AS total_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, round(CAST(total_c AS DOUBLE) / 10000.0, 2) AS total_revenue
      FROM supplier, revenue
      WHERE s_suppkey = supplier_no AND total_c = (SELECT max(total_c) FROM revenue)
      ORDER BY s_suppkey""",

    // Q16: supplier counts per part group — NOT IN blacklist + COUNT
    // DISTINCT (suppliers who shipped the part, partsupp analog).
    "h16_supplier_cnt" -> """
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM part, lineitem
      WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    // Q17: small-quantity revenue — the classic correlated scalar AVG.
    "h17_small_qty_revenue" -> s"""
      SELECT round(CAST(sum($epc) AS DOUBLE) / 7.0 / 100.0, 2) AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
        AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)""",

    // Q18: large-volume customers — IN over a grouped HAVING subquery.
    // The textbook form (IN-subquery over a grouped lineitem HAVING)
    // aggregates lineitem TWICE — once for the filter, once for the
    // output sum — and the two aggregates are over the same key, so they
    // are the same relation: derive per-order quantity ONCE and both
    // filter and project from it (same rewrite both engines run, shared
    // text; 2.0 s → ~1.2 s at sf0.1).
    "h18_large_volume_cust" -> """
      WITH order_qty AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
      FROM customer, orders, order_qty
      WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        AND total_qty > 150
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",

    // Q19: bracketed OR-of-ANDs predicate across the join.
    "h19_bracketed_revenue" -> s"""
      SELECT round(CAST($revC AS DOUBLE) / 10000.0, 2) AS revenue
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND
        ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 40))""",

    // Q20: potential promotion — nested IN-subquery whose HAVING compares
    // against an uncorrelated scalar (availability analog).
    "h20_promotion_suppliers" -> """
      SELECT s_name, s_suppkey
      FROM supplier, nation
      WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem, part
          WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > (SELECT 1.5 * avg(l_quantity) FROM lineitem))
        AND s_nationkey = n_nationkey AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      ORDER BY s_name""",

    // Q22: global sales opportunity — scalar-subquery threshold + NOT
    // EXISTS anti-join (country code := c_nationkey).
    "h22_sales_opportunity" -> """
      SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS totacctbal
      FROM customer
      WHERE c_nationkey IN (0, 1, 2, 3)
        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0 AND c_nationkey IN (0, 1, 2, 3))
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY c_nationkey ORDER BY c_nationkey"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlText.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => { Tables.register(s, dir); s.sql(text) })
    }

  def oracle: Map[String, String] = sqlText
}
