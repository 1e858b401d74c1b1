package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-row-error-handling line parser shared by the delimited external
  * sources ([[ExecSource]], [[HttpSource]]) — the `src/backend/cdb/
  * cdbsreh.c` contract: a malformed line diverts to a per-partition
  * reject file (reason-tagged, the error-log analog) and the scan FAILS
  * once the partition's reject count exceeds `rejectLimit`
  * (`SEGMENT REJECT LIMIT N ROWS`; limit 0 is PG's all-or-nothing).
  *
  * EVERY field is validated against the FULL column list (sreh must
  * reject the same rows regardless of the query's projection); only the
  * projected columns materialize into the emitted row.
  */
private[sources] final class SrehLineParser(
    schema0: StructType, required: StructType, delimiter: String,
    rejectLimit: Int, rejectDir: Option[String], partitionId: Int) {

  private val outIdx: Array[Int] = required.fieldNames.map(schema0.fieldIndex)
  private val sink = new SrehRejects(rejectLimit, rejectDir, partitionId)

  /** Parse one line or record a reject; null = rejected. */
  def parse(line: String): InternalRow = {
    val fields = line.split(java.util.regex.Pattern.quote(delimiter), -1)
    if (fields.length != schema0.length) {
      reject(line, s"expected ${schema0.length} fields, got ${fields.length}")
      return null
    }
    val vals = new Array[Any](schema0.length)
    var i = 0
    while (i < fields.length) {
      schema0.fields(i).dataType match {
        case LongType =>
          try vals(i) = fields(i).trim.toLong
          catch { case _: NumberFormatException =>
            reject(line, s"field ${schema0.fields(i).name}: not a bigint: '${fields(i)}'")
            return null }
        case DoubleType =>
          try vals(i) = fields(i).trim.toDouble
          catch { case _: NumberFormatException =>
            reject(line, s"field ${schema0.fields(i).name}: not a double: '${fields(i)}'")
            return null }
        case _ => vals(i) = UTF8String.fromString(fields(i))
      }
      i += 1
    }
    InternalRow.fromSeq(outIdx.toIndexedSeq.map(vals(_)))
  }

  def reject(line: String, reason: String): Unit = sink.reject(line, reason)

  def flush(): Unit = sink.flush()
}

/** The reject-side bookkeeping alone (divert + limit + per-partition
  * error log), for sources whose record format isn't delimited lines —
  * [[PgCopySource]] rejects whole binary tuples through the same
  * contract. */
private[sources] final class SrehRejects(
    rejectLimit: Int, rejectDir: Option[String], partitionId: Int) {

  private val rejects = scala.collection.mutable.ArrayBuffer.empty[String]

  def reject(payload: String, reason: String): Unit = {
    rejects += s"$reason\t$payload"
    if (rejects.length > rejectLimit)
      throw new IllegalStateException(
        s"segment reject limit ($rejectLimit) exceeded in partition $partitionId; " +
        s"last: ${rejects.last}")
  }

  /** Divert the partition's rejects to the error log (cdbsreh's
    * error-table analog) — one file per partition, no write contention. */
  def flush(): Unit =
    rejectDir.filter(_ => rejects.nonEmpty).foreach { dir =>
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(s"part-$partitionId.rejects"),
        rejects.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
}
