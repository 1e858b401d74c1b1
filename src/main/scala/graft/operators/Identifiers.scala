package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Identifier types: contrib/isn (EAN13/ISBN check-digit math —
  * `contrib/isn/isn.c:278 weight_checkdig` mod-11, and the EAN13
  * alternating 1/3 mod-10 rule in `checkdig`) and uuid-ossp's
  * name-based deterministic UUID construction
  * (`contrib/uuid-ossp/uuid-ossp.c uuid_generate_v3` — MD5 of
  * namespace‖name with version/variant bits patched in).
  *
  * Both are pure per-row digit arithmetic — generated once in Scala as
  * an expression string and evaluated identically by Spark codegen and
  * the DuckDB oracle. The random UUID variants (v1/v4, gen_random_uuid)
  * are deliberately out: nondeterministic by design.
  */
object Identifiers {

  /** Σ over the 12 EAN digits with alternating weights 1,3 (isn.c
    * checkdig): digit positions are 1-based in substring. */
  private def ean13Sum(col: String): String =
    (1 to 12).map { i =>
      val w = if (i % 2 == 1) 1 else 3
      s"$w * CAST(substring($col, $i, 1) AS INT)"
    }.mkString(" + ")

  /** Σ (10-i+1)·d_i over the 9 ISBN digits (isn.c:278 weight_checkdig:
    * weights 10 down to 2). */
  private def isbn10Sum(col: String): String =
    (1 to 9).map(i => s"${11 - i} * CAST(substring($col, $i, 1) AS INT)")
      .mkString(" + ")

  private val uuidExpr: String = {
    // variant nibble: (n & 3) | 8 over the hex char at position 17
    val variant = "CASE WHEN substring(h, 17, 1) IN ('0','4','8','c') THEN '8' " +
      "WHEN substring(h, 17, 1) IN ('1','5','9','d') THEN '9' " +
      "WHEN substring(h, 17, 1) IN ('2','6','a','e') THEN 'a' ELSE 'b' END"
    "concat(substring(h, 1, 8), '-', substring(h, 9, 4), '-3', " +
      s"substring(h, 14, 3), '-', $variant, substring(h, 18, 3), '-', " +
      "substring(h, 21, 12))"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "is01_isn_checkdigits" -> { (s, dir) =>
      Tables.df(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .withColumn("ean_base", concat(lit("978"), lpad(col("p_partkey").cast("string"), 9, "0")))
        .withColumn("isbn_base", lpad(col("p_partkey").cast("string"), 9, "0"))
        .withColumn("ean_check",
          expr(s"CAST((10 - (${ean13Sum("ean_base")}) % 10) % 10 AS INT)"))
        .withColumn("isbn_w", expr(s"(${isbn10Sum("isbn_base")}) % 11"))
        .select(col("p_partkey"),
          concat(col("ean_base"), col("ean_check")).as("ean13"),
          // isn.c: check = 11 - weight, rendered 'X' at 10, '0' at 11
          expr("CASE (11 - isbn_w) % 11 WHEN 10 THEN 'X' " +
            "ELSE CAST((11 - isbn_w) % 11 AS STRING) END").as("isbn10_check"))
        .orderBy(col("p_partkey"))
    },

    "u01_uuid_v3" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .withColumn("h", md5(concat(lit("graft-ns:doc-"), col("doc_id").cast("string"))))
        .select(col("doc_id"), expr(uuidExpr).as("uuid3"))
        .orderBy(col("doc_id"))
    },

    // -- id01: sequence / nextval — distributed DENSE id allocation
    //    (CREATE SEQUENCE + nextval, `src/backend/commands/sequence.c`;
    //    GP grants each segment a preallocated RANGE from the sequence
    //    server so executors never serialize on a counter). The 100 TB
    //    shape for "number every row densely in a deterministic order"
    //    WITHOUT a global sort: (1) range-bucket rows by the first hex
    //    digit of their order key's md5 — a lexicographic PREFIX of the
    //    global order, so buckets are contiguous id ranges (16
    //    "segments"); (2) per-bucket counts partial-agg map-side to 16
    //    rows whose running sum is each bucket's range START (the
    //    sequence-server grant; ch02's distributed prefix sum); (3) a
    //    bucket-partitioned window numbers rows inside their grant.
    //    The ONLY corpus-wide window partitions by bucket — the
    //    single-partition window lives on the 16-row grant relation.
    //    Oracle: the same ids via one global row_number --
    "id01_sequence_alloc" -> { (s, dir) =>
      val w16 = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("b")).orderBy(col("h"), col("o_orderkey"))
      val rows = Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), md5(col("o_orderkey").cast("string")).as("h"))
        .withColumn("b", substring(col("h"), 1, 1))
      val grants = rows.groupBy(col("b")).agg(count(lit(1)).as("n"))
        .withColumn("off", coalesce(sum(col("n")).over(w16), lit(0L)))
        .select(col("b"), col("off"))
      rows.join(broadcast(grants), Seq("b"))
        .withColumn("seq_id", (col("off") + row_number().over(wb)).cast("long"))
        .select(col("o_orderkey"), col("seq_id"))
        .orderBy(col("o_orderkey"))
    }
  )

  def oracle: Map[String, String] = Map(
    "is01_isn_checkdigits" -> s"""
      WITH src AS (
        SELECT p_partkey,
          '978' || lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS ean_base,
          lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS isbn_base
        FROM part WHERE p_partkey <= 200),
      calc AS (
        SELECT p_partkey, ean_base,
          CAST((10 - (${ean13Sum("ean_base")}) % 10) % 10 AS INT) AS ean_check,
          (${isbn10Sum("isbn_base")}) % 11 AS isbn_w
        FROM src)
      SELECT p_partkey,
        ean_base || CAST(ean_check AS VARCHAR) AS ean13,
        CASE (11 - isbn_w) % 11 WHEN 10 THEN 'X'
          ELSE CAST((11 - isbn_w) % 11 AS VARCHAR) END AS isbn10_check
      FROM calc ORDER BY p_partkey""",

    "u01_uuid_v3" -> s"""
      WITH src AS (
        SELECT doc_id, md5('graft-ns:doc-' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE doc_id <= 200)
      SELECT doc_id, $uuidExpr AS uuid3
      FROM src ORDER BY doc_id""",

    // the distributed two-phase allocation must equal one global
    // row_number over the same deterministic order
    "id01_sequence_alloc" -> """
      SELECT o_orderkey,
        CAST(row_number() OVER (
          ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS BIGINT) AS seq_id
      FROM orders ORDER BY o_orderkey"""
  )
}
