package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** intarray slice (reference `contrib/intarray/_int_op.c` + _int_tool.c):
  * the tag-filtering operator set over sorted int arrays — `&&` overlap
  * (inner_int_overlap), `@>` contains (inner_int_contains), `#`
  * cardinality, `sort`/`uniq` normalization, and `&` intersection
  * (inner_int_inter). The workload it exists for is tag search:
  * "which orders touch any/all of these suppliers".
  *
  * Tags per order: `uniq(sort_asc(l_suppkey % 25))` — exactly the
  * reference's normalization pipeline, here one `array_sort ∘
  * collect_set` aggregate (collect_set's order nondeterminism is
  * erased by the sort, both engines agree bit-for-bit).
  *
  * Scale shape: building the tag arrays is ONE hash aggregate over
  * lineitem (map-side collect_set partials); the probe comparisons are
  * per-row codegen'd array intrinsics against a 3-element literal —
  * no join at all — and the final histogram is a second tiny rollup.
  * That is the 100 TB plan: tag arrays live next to the fact row
  * (the reference would GIN-index them; columnar Spark just streams
  * them), probes evaluate in the scan's codegen span.
  */
object IntArray {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_intarray_tags" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(expr("CAST(l_suppkey % 25 AS BIGINT)")))
          .as("tags"))
        // probe ANY of {3, 7, 11}  (intarray `&&`)
        .withColumn("has_any",
          expr("arrays_overlap(tags, array(3L, 7L, 11L))"))
        // probe ALL of {3, 7}      (intarray `@>`)
        .withColumn("has_all",
          expr("size(array_except(array(3L, 7L), tags)) = 0"))
        // |tags & probe|           (intarray `&` then `#`)
        .withColumn("n_common",
          expr("size(array_intersect(tags, array(3L, 7L, 11L)))"))
        .groupBy(expr("size(tags)").as("n_tags"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("has_any").cast("long")).as("n_has_any"),
          sum(col("has_all").cast("long")).as("n_has_all"),
          sum(col("n_common").cast("long")).as("sum_common"))
        .orderBy(col("n_tags"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q113_intarray_tags" -> """
      WITH tagged AS (
        SELECT l_orderkey,
               array_agg(DISTINCT CAST(l_suppkey % 25 AS BIGINT)
                         ORDER BY CAST(l_suppkey % 25 AS BIGINT)) AS tags
        FROM lineitem GROUP BY l_orderkey),
      probed AS (
        SELECT len(tags) AS n_tags,
               list_has_any(tags, [3, 7, 11]) AS has_any,
               list_has_all(tags, [3, 7]) AS has_all,
               len(list_intersect(tags, [3, 7, 11])) AS n_common
        FROM tagged)
      SELECT CAST(n_tags AS INT) AS n_tags, count(*) AS n_orders,
        CAST(sum(CASE WHEN has_any THEN 1 ELSE 0 END) AS BIGINT) AS n_has_any,
        CAST(sum(CASE WHEN has_all THEN 1 ELSE 0 END) AS BIGINT) AS n_has_all,
        CAST(sum(n_common) AS BIGINT) AS sum_common
      FROM probed GROUP BY n_tags ORDER BY n_tags"""
  )
}
