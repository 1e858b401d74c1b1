package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ltree slice (reference `contrib/ltree/`): materialized-path trees as
  * dot-separated label strings. Covered operator surface:
  *  - `@>` ancestor-or-self (ltree_op.c ltree_isparent / inner_isparent:
  *    a label-prefix compare) → l01
  *  - nlevel / subpath / subltree (ltree_op.c:27-32) → l02
  *  - lca (ltree_op.c:36, longest common label prefix) → l03
  *
  * The tree is the natural one in the data: region → nation → customer
  * → order, labels made ltree-safe the way ltree_in would demand
  * (`replace(' ', '_')` — ltree_io.c rejects spaces in labels).
  *
  * Scale shapes:
  *  - l01 joins the corpus against a TINY broadcast ancestor set with a
  *    codegen'd prefix compare (BroadcastNestedLoopJoin, plan-asserted).
  *    That is the right plan for "a handful of subtree roots"; for a
  *    LARGE ancestor set the rewrite is l02's shape — equality on
  *    subpath(path, 0, k), a plain hash shuffle key, exactly how the
  *    reference's GiST index degrades to a btree on the first k labels.
  *  - l02/l03 are single-pass label arithmetic (split_part is codegen'd
  *    string slicing, no regex) feeding one partial-agg rollup; lca
  *    needs no self-join against the corpus — pairs come from an
  *    equi-join on a derived key.
  */
object Ltree {

  /** customer paths: REGION.NATION_k.c<custkey> (depth 3). */
  private def custPaths(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.df(s, dir, "nation")
    val region = Tables.df(s, dir, "region")
      .withColumn("r_label", expr("replace(r_name, ' ', '_')"))
    Tables.df(s, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_acctbal"),
        concat(col("r_label"), lit("."), col("n_name"), lit(".c"),
          col("c_custkey")).as("path"))
  }

  // l03 as ONE SQL text shared by Spark and the oracle: lca over pairs
  // (customer c, customer 2c) — same-nation / same-region / disjoint mix.
  // split_part (plain delimiter, 1-based, '' when out of range) behaves
  // identically in both engines, so the lca CASE ladder is portable.
  private val LcaSql = """
    WITH paths AS (
      SELECT c_custkey,
             replace(r_name, ' ', '_') || '.' || n_name || '.c' || c_custkey
               AS path
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey),
    pairs AS (
      SELECT a.path AS pa, b.path AS pb
      FROM paths a JOIN paths b ON b.c_custkey = a.c_custkey * 2),
    lca AS (
      SELECT
        CASE WHEN split_part(pa, '.', 1) <> split_part(pb, '.', 1) THEN 0
             WHEN split_part(pa, '.', 2) <> split_part(pb, '.', 2) THEN 1
             WHEN split_part(pa, '.', 3) <> split_part(pb, '.', 3) THEN 2
             ELSE 3 END AS lca_depth,
        CASE WHEN split_part(pa, '.', 1) <> split_part(pb, '.', 1) THEN ''
             WHEN split_part(pa, '.', 2) <> split_part(pb, '.', 2)
               THEN split_part(pa, '.', 1)
             ELSE split_part(pa, '.', 1) || '.' || split_part(pa, '.', 2)
             END AS lca_path
      FROM pairs)
    SELECT lca_depth, count(*) AS n_pairs,
           min(lca_path) AS min_lca, max(lca_path) AS max_lca
    FROM lca GROUP BY lca_depth ORDER BY lca_depth"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- l01: subtree rollup via @> against a broadcast ancestor set
    //    (5 region roots + 25 nation roots; every customer matches one
    //    of each — multi-level subtree aggregation, the GiST workload).
    "l01_ltree_isparent" -> { (s, dir) =>
      val nation = Tables.df(s, dir, "nation")
      val region = Tables.df(s, dir, "region")
        .withColumn("r_label", expr("replace(r_name, ' ', '_')"))
      val nationAnc = nation
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(concat(col("r_label"), lit("."), col("n_name")).as("anc"))
      val regionAnc = region.select(col("r_label").as("anc"))
      val ancestors = regionAnc.unionAll(nationAnc)
      custPaths(s, dir)
        // ltree_isparent: anc's labels are a prefix of path's labels
        .join(broadcast(ancestors),
          expr("left(path, length(anc) + 1) = anc || '.'"))
        .groupBy(col("anc"))
        .agg(count(lit(1)).as("n_desc"),
          sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("bal_cents"),
          min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"))
        .orderBy(col("anc"))
    },

    // -- l02: nlevel / subpath over a ragged tree (customers depth 3,
    //    orders depth 4), rolled up at subpath(path, 0, 2) — the
    //    equality-on-prefix shape that replaces l01's predicate join
    //    when the ancestor set is large.
    "l02_ltree_depth_rollup" -> { (s, dir) =>
      val cust = custPaths(s, dir).select(col("path"), col("c_custkey"))
      val ord = Tables.df(s, dir, "orders")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(concat(col("path"), lit(".o"), col("o_orderkey")).as("path"))
      val tree = cust.select(col("path")).unionAll(ord)
      tree
        .withColumn("nlevel", expr(
          "CASE WHEN split_part(path, '.', 4) <> '' THEN 4 ELSE 3 END"))
        .withColumn("lvl2", expr(
          "split_part(path, '.', 1) || '.' || split_part(path, '.', 2)"))
        .groupBy(col("lvl2"))
        .agg(count(lit(1)).as("n_paths"),
          sum(when(col("nlevel") === 4, 1L).otherwise(0L)).as("n_leaves"),
          max(col("nlevel")).as("max_depth"),
          min(col("path")).as("min_path"))
        .orderBy(col("lvl2"))
    },

    // -- l03: lca distribution over derived pairs (shared SQL text). --
    "l03_ltree_lca" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql(LcaSql)
    }
  )

  def oracle: Map[String, String] = Map(
    "l03_ltree_lca" -> LcaSql,
    "l01_ltree_isparent" -> """
      WITH region_l AS (
        SELECT r_regionkey, replace(r_name, ' ', '_') AS r_label FROM region),
      paths AS (
        SELECT c_custkey, c_acctbal,
               r_label || '.' || n_name || '.c' || c_custkey AS path
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region_l ON n_regionkey = r_regionkey),
      ancestors AS (
        SELECT r_label AS anc FROM region_l
        UNION ALL
        SELECT r_label || '.' || n_name
        FROM nation JOIN region_l ON n_regionkey = r_regionkey)
      SELECT anc, count(*) AS n_desc,
        CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
          AS bal_cents,
        min(c_custkey) AS min_key, max(c_custkey) AS max_key
      FROM paths JOIN ancestors
        ON left(path, length(anc) + 1) = anc || '.'
      GROUP BY anc ORDER BY anc""",
    "l02_ltree_depth_rollup" -> """
      WITH region_l AS (
        SELECT r_regionkey, replace(r_name, ' ', '_') AS r_label FROM region),
      cust AS (
        SELECT c_custkey,
               r_label || '.' || n_name || '.c' || c_custkey AS path
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region_l ON n_regionkey = r_regionkey),
      tree AS (
        SELECT path FROM cust
        UNION ALL
        SELECT path || '.o' || o_orderkey
        FROM orders JOIN cust ON o_custkey = c_custkey),
      lv AS (
        SELECT path,
          CASE WHEN split_part(path, '.', 4) <> '' THEN 4 ELSE 3 END AS nlevel,
          split_part(path, '.', 1) || '.' || split_part(path, '.', 2) AS lvl2
        FROM tree)
      SELECT lvl2, count(*) AS n_paths,
        CAST(sum(CASE WHEN nlevel = 4 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_leaves,
        max(nlevel) AS max_depth, min(path) AS min_path
      FROM lv GROUP BY lvl2 ORDER BY lvl2"""
  )
}
