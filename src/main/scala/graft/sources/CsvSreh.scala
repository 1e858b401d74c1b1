package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COPY-style CSV ingestion with single-row error handling — the
  * reference's sreh layer (`src/backend/commands/copy.c:412-434`,
  * `src/backend/cdb/cdbsreh.c`): `LOG ERRORS SEGMENT REJECT LIMIT n
  * [ROWS|PERCENT]` loads good rows, diverts bad rows to an error table,
  * and aborts the load if rejects exceed the limit.
  *
  * Spark rendition: PERMISSIVE parse with a corrupt-record column —
  * malformed rows survive as diagnostics instead of failing the job —
  * plus a driver-side reject-limit check. Per-partition parsing, no
  * driver concentration: the only driver action is the two-row count.
  */
object CsvSreh {

  final case class LoadResult(good: DataFrame, bad: DataFrame,
                              nGood: Long, nBad: Long)

  class RejectLimitExceeded(val nBad: Long, val limit: Long)
    extends RuntimeException(
      s"segment reject limit $limit exceeded: $nBad rows rejected")

  /** Load a CSV file tolerantly; throw [[RejectLimitExceeded]] if more
    * than `rejectLimit` rows fail to parse (`SEGMENT REJECT LIMIT n ROWS`).
    * `ddlSchema` is the target schema WITHOUT the corrupt column. */
  def load(spark: SparkSession, path: String, ddlSchema: String,
           rejectLimit: Long): LoadResult = {
    val withCorrupt = ddlSchema + ", _corrupt STRING"
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
      .cache() // one parse, two counts — the load would re-read otherwise
    val bad = raw.filter(col("_corrupt").isNotNull)
    val good = raw.filter(col("_corrupt").isNull).drop("_corrupt")
    val nBad = bad.count()
    if (nBad > rejectLimit) throw new RejectLimitExceeded(nBad, rejectLimit)
    LoadResult(good, bad, raw.count() - nBad, nBad)
  }
}
