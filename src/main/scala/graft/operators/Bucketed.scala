package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution metadata — `DISTRIBUTED BY` ≙ bucketed tables
  * (`src/include/catalog/gp_distribution_policy.h:86-111`, SURVEY §1.2,
  * build-plan step 4). Cloudberry hash-distributes every table on its
  * distribution key so equi-joins on that key run co-located with NO
  * motion; Spark's persisted analog is `bucketBy(n, key)`: both sides
  * pre-hashed into the same number of buckets, so the join plans with no
  * Exchange on either side (asserted in PlanShapeSpec with broadcast
  * disabled). At 100 TB this removes the two largest shuffles of the
  * canonical orders⋈lineitem join — the single biggest motion saving the
  * reference's distribution policies buy.
  */
object Bucketed {

  private val NumBuckets = 8

  private def tag(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Build-once per session: register orders/lineitem bucketed by their
    * join key (the session catalog is in-memory, so each JVM re-writes
    * into the shared warehouse directory — CREATE TABLE ... DISTRIBUTED
    * BY re-run per session). */
  def ensure(s: SparkSession, dir: String): (String, String) = {
    // GP's distribution is PHYSICAL — a table is always read through its
    // distribution layout. Spark's autoBucketedScan instead drops the
    // bucketed layout when the planner sees no exchange to elide, which
    // also forfeits bucket PRUNING on key-equality probes (b03's whole
    // point). Pin layout reads on while a b-family plan is built and
    // executed; because execution is lazy the restore can't live here —
    // every runner (Bench/Verify hygiene, QueriesSpec/PlanShapeSpec
    // finallys) resets this conf to its default after each query, so a
    // b-query can't leak layout-pinning into later plans (r8 advice).
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val (ot, lt) = (s"orders_bucketed_${tag(dir)}", s"lineitem_bucketed_${tag(dir)}")
    def create(table: String, src: String, key: String): Unit =
      if (!s.catalog.tableExists(table)) {
        // a previous JVM may have left the managed location behind while
        // the in-memory catalog entry died with it — clear the location
        // so CREATE TABLE succeeds (re-running the DDL)
        val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
        val loc = new java.io.File(wh, table.toLowerCase)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(loc)
        }
        // repartition on the bucket key with numPartitions == numBuckets:
        // Spark's repartition hash (Murmur3 pmod n) IS the bucket-id hash,
        // so each task holds exactly one bucket → ONE file per bucket.
        // That is what lets FileSourceScanExec report outputOrdering on
        // the sort key, and a downstream SortMergeJoin plan with ZERO
        // Sort nodes (PG's IncrementalSort exploits the same pre-sorted
        // layout; here the sort is elided entirely — b02 + PlanShapeSpec)
        Tables.df(s, dir, src)
          .repartition(NumBuckets, org.apache.spark.sql.functions.col(key))
          .write.mode("overwrite").bucketBy(NumBuckets, key)
          .sortBy(key).format("parquet").saveAsTable(table)
      }
    create(ot, "orders", "o_orderkey")
    create(lt, "lineitem", "l_orderkey")
    (ot, lt)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- co-located join on the distribution key (no exchange) --
    "b01_bucketed_join" -> { (s, dir) =>
      val (ot, lt) = ensure(s, dir)
      val o = s.table(ot)
      val l = s.table(lt)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          expr("round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2)").as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    // -- pre-sorted merge join (IncrementalSort counterpart, SURVEY §2.6:
    //    `nodeIncrementalSort.c` resorts only suffix keys of presorted
    //    input; the Spark-first rendition goes further — the bucketed
    //    layout is already sorted on the join key with one file per
    //    bucket, so the merge join plans with NO Exchange and NO Sort at
    //    all: the scan itself reports the ordering. PlanShapeSpec asserts
    //    zero SortExec with broadcast disabled) --
    "b02_presorted_merge_join" -> { (s, dir) =>
      val (ot, lt) = ensure(s, dir)
      s.table(lt).join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"),
          sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("total_qty"))
        .orderBy(col("o_orderstatus"))
    },

    // -- b03: BUCKET PRUNING — the point-lookup payoff of distribution
    //    keys: an equality/IN filter on the bucket key lets the scan
    //    read ONLY the buckets those keys hash to (reference analog:
    //    gp_segment direct dispatch, `cdbmutate.c` directDispatch —
    //    Cloudberry sends a distribution-key point query to the ONE
    //    segment that can hold it instead of broadcasting the scan).
    //    Spark's FileSourceScanExec reports SelectedBucketsCount; the
    //    plan assert pins pruned < total. At 100 TB this is the
    //    difference between reading 3/8 of the table and all of it --
    "b03_bucket_pruning" -> { (s, dir) =>
      val (ot, _) = ensure(s, dir)
      s.table(ot)
        .filter(col("o_orderkey").isin(7L, 1223L, 4999L))
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .orderBy(col("o_orderkey"))
    },

    // -- b04: EXCHANGE-FREE aggregation on the distribution key — the
    //    other half of DISTRIBUTED BY's payoff next to b01's co-located
    //    join: a GROUP BY on the bucket key is already hash-distributed
    //    by the storage layout, so the first (wide, per-order) aggregate
    //    runs with NO shuffle at all (FileSourceScanExec's
    //    outputPartitioning satisfies the aggregate's requirement —
    //    GP runs the same agg motion-free on the segments). Only the
    //    second, histogram-sized rollup exchanges. Plan-asserted: one
    //    Exchange total --
    "b04_bucketed_agg" -> { (s, dir) =>
      val (_, lt) = ensure(s, dir)
      s.table(lt)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
        .groupBy(col("n_lines"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_lines"))
    }
  )

  def oracle: Map[String, String] = Map(
    "b01_bucketed_join" -> """
      SELECT o_orderpriority, count(*) AS n_items,
        round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "b02_presorted_merge_join" -> """
      SELECT o_orderstatus,
        count(DISTINCT o_orderkey) AS n_orders,
        count(*) AS n_items,
        CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "b03_bucket_pruning" -> """
      SELECT o_orderkey, o_orderstatus,
        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey IN (7, 1223, 4999)
      ORDER BY o_orderkey""",

    "b04_bucketed_agg" -> """
      SELECT n_lines, count(*) AS n_orders
      FROM (SELECT l_orderkey, count(*) AS n_lines
            FROM lineitem GROUP BY l_orderkey) t
      GROUP BY n_lines ORDER BY n_lines"""
  )
}
