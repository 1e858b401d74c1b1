package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** JSON function family (SURVEY.md §2.9: `src/backend/utils/adt/jsonb.c`,
  * `jsonfuncs.c`, `jsonpath_exec.c`; JSON_TABLE ≙ nodeTableFuncscan.c).
  *
  * JSON documents are built deterministically from table columns with
  * plain string concat — identical bytes in both engines — then pulled
  * apart with path extraction, array functions, and schema-on-read
  * (`from_json` + explode ≙ JSON_TABLE).
  *
  * Scale: all per-row codegen'd expressions, no UDFs; JSON parsing
  * happens executor-side on the hot path exactly like PG's jsonb_*
  * C functions. */
object Json {

  private val docExpr =
    """concat('{"k":', o_orderkey, ',"status":"', o_orderstatus,
       '","tags":["x","', o_orderpriority, '"]}')"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- jsonpath field/array extraction (jsonpath_exec.c) --
    "q55_json_extract" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .withColumn("j", expr(docExpr))
        .select(
          col("o_orderkey"),
          get_json_object(col("j"), "$.k").cast("bigint").as("k"),
          get_json_object(col("j"), "$.status").as("status"),
          get_json_object(col("j"), "$.tags[1]").as("tag1"),
          json_array_length(get_json_object(col("j"), "$.tags")).as("n_tags"))
        .orderBy(col("o_orderkey"))
    },

    // -- JSON_TABLE: array-of-objects → rows (from_json + inline) --
    "q56_json_table" -> { (s, dir) =>
      val arrExpr =
        """concat('[{"pos":1,"val":"', o_orderstatus,
           '"},{"pos":2,"val":"', o_orderpriority, '"}]')"""
      Tables.df(s, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .withColumn("j", expr(arrExpr))
        .select(col("o_orderkey"),
          inline(from_json(col("j"),
            org.apache.spark.sql.types.DataType.fromDDL("array<struct<pos:int,val:string>>"))))
        .orderBy(col("o_orderkey"), col("pos"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q55_json_extract" -> """
      SELECT o_orderkey,
        CAST(json_extract_string(j, '$.k') AS BIGINT) AS k,
        json_extract_string(j, '$.status') AS status,
        json_extract_string(j, '$.tags[1]') AS tag1,
        CAST(json_array_length(j, '$.tags') AS INTEGER) AS n_tags
      FROM (
        SELECT o_orderkey,
          '{"k":' || o_orderkey || ',"status":"' || o_orderstatus ||
          '","tags":["x","' || o_orderpriority || '"]}' AS j
        FROM orders WHERE o_orderkey <= 2000)
      ORDER BY o_orderkey""",

    // semantic mirror of the JSON_TABLE expansion: each source row emits
    // (1, status) and (2, priority)
    "q56_json_table" -> """
      SELECT o_orderkey, pos, val FROM (
        SELECT o_orderkey, 1 AS pos, o_orderstatus AS val
        FROM orders WHERE o_orderkey <= 1000
        UNION ALL
        SELECT o_orderkey, 2 AS pos, o_orderpriority AS val
        FROM orders WHERE o_orderkey <= 1000)
      ORDER BY o_orderkey, pos"""
  )
}
