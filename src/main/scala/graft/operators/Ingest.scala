package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** COPY-FROM with row-error diversion as a query (`copy.c` + `cdbsreh.c`
  * semantics — see graft.sources.CsvSreh for the file-based API, which
  * the ScalaTest suite drives against a real CSV on disk).
  *
  * Here the CSV lines are synthesized deterministically from `documents`
  * (~10% malformed: a non-numeric field), parsed executor-side with
  * PERMISSIVE `from_csv` + corrupt-record column, and the result audits
  * the load: rows loaded, rows rejected, and whether the reject limit
  * held — the exact bookkeeping `SEGMENT REJECT LIMIT ... PERCENT` does.
  */
object Ingest {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_csv_sreh" -> { (s, dir) =>
      val lines = Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          concat(
            col("doc_id"), lit(","),
            when(col("doc_id") % 10 === 3, lit("notanumber"))
              .otherwise(col("n_chars").cast("string")),
            lit(","), col("lang")).as("line"))
      val parsed = lines.select(
        col("doc_id"),
        from_csv(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, n BIGINT, lang STRING, _corrupt STRING"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
      parsed.agg(
        count(when(col("r._corrupt").isNull, 1)).as("n_loaded"),
        count(when(col("r._corrupt").isNotNull, 1)).as("n_rejected"),
        (count(when(col("r._corrupt").isNotNull, 1)) * 100 <= count(lit(1)) * 15)
          .cast("int").as("within_limit"))
    }
  )

  def oracle: Map[String, String] = Map(
    // the malformed-line rule is deterministic, so the oracle audits the
    // same load arithmetic directly
    "c01_csv_sreh" -> """
      SELECT
        count(CASE WHEN doc_id % 10 <> 3 THEN 1 END) AS n_loaded,
        count(CASE WHEN doc_id % 10 = 3 THEN 1 END) AS n_rejected,
        CAST(CASE WHEN count(CASE WHEN doc_id % 10 = 3 THEN 1 END) * 100
                    <= count(*) * 15 THEN 1 ELSE 0 END AS INTEGER) AS within_limit
      FROM documents"""
  )
}
