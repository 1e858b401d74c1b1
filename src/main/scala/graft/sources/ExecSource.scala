package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Exec-protocol external table — the reference's `CREATE EXTERNAL TABLE
  * ... EXECUTE 'command' ON ALL` (`src/backend/access/external/
  * url_execute.c`; the gpfdist side of the same surface is
  * `src/bin/gpfdist/`): every segment runs the command and parses its
  * stdout as delimited rows. Spark rendition: a DSv2 batch source that
  * launches the command once per input partition ON THE EXECUTOR — the
  * driver never sees a byte of data — with the partition index exported
  * as `GRAFT_SEGMENT_ID` / `GRAFT_SEGMENT_COUNT` (the `GP_SEGMENT_ID`
  * contract, so a command can shard its own output).
  *
  * Single-row-error-handling (sreh, `src/backend/cdb/cdbsreh.c`) is
  * first-class, as in [[CsvSreh]]: a malformed line is diverted to a
  * per-partition reject file (reason-tagged, the error-log analog), and
  * the scan FAILS once a partition's reject count exceeds
  * `reject_limit` — `SEGMENT REJECT LIMIT N ROWS` semantics; the default
  * limit 0 is PG's all-or-nothing.
  *
  * Options: `command` (sh -c), `partitions`, `columns` (e.g.
  * `"n bigint, label string"` — bigint/double/string), `delimiter`
  * (default `|`), `reject_limit`, `reject_dir`.
  *
  * Scale: embarrassingly parallel (one process per partition, streamed
  * line-by-line — no buffering of the whole output), no shuffle, no
  * driver materialization; reject files go to a per-partition path so
  * there is no write contention.
  */
class ExecSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExecSource.parseColumns(options.getOrDefault("columns", "line string"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ExecTable(
      ExecSource.parseColumns(opts.getOrDefault("columns", "line string")),
      opts.getOrDefault("command", "true"),
      opts.getOrDefault("partitions", "4").toInt,
      opts.getOrDefault("delimiter", "|"),
      opts.getOrDefault("reject_limit", "0").toInt,
      Option(opts.get("reject_dir")))
  }
}

object ExecSource {
  /** `"n bigint, label string"` → StructType (the external-table column
    * list; nullable, as parse failures of ONE field reject the row rather
    * than null it — sreh rejects whole rows, same as the reference). */
  def parseColumns(spec: String): StructType =
    spec.split(",").map(_.trim).filter(_.nonEmpty).foldLeft(new StructType()) {
      (st, c) =>
        val parts = c.split("\\s+")
        require(parts.length == 2, s"bad column spec: '$c'")
        val dt = parts(1).toLowerCase match {
          case "bigint" | "long" => LongType
          case "double" => DoubleType
          case "string" | "varchar" | "text" => StringType
          case other => throw new IllegalArgumentException(s"unsupported type: $other")
        }
        st.add(parts(0), dt)
    }
}

private[sources] class ExecTable(schema0: StructType, command: String,
                                 partitions: Int, delimiter: String,
                                 rejectLimit: Int, rejectDir: Option[String])
  extends Table with SupportsRead {
  override def name(): String = s"exec($command)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExecScanBuilder(schema0, command, partitions, delimiter, rejectLimit, rejectDir)
}

private[sources] class ExecScanBuilder(full: StructType, command: String,
                                       partitions: Int, delimiter: String,
                                       rejectLimit: Int, rejectDir: Option[String])
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = full
  // arity + type checks still run against the FULL column list (sreh must
  // reject the same rows regardless of the query's projection); pruning
  // shrinks the emitted row, which is what the exchange/operators carry
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new ExecScan(full, required, command, partitions, delimiter, rejectLimit, rejectDir)
}

private[sources] class ExecScan(full: StructType, required: StructType,
                                command: String, partitions: Int, delimiter: String,
                                rejectLimit: Int, rejectDir: Option[String])
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"ExecScan command=[$command] partitions=$partitions cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (0 until partitions).map(ExecPartition(_, partitions)).toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new ExecReaderFactory(full, required, command, delimiter, rejectLimit, rejectDir)
}

private[sources] case class ExecPartition(id: Int, count: Int) extends InputPartition

private[sources] class ExecReaderFactory(schema0: StructType, required: StructType,
                                         command: String,
                                         delimiter: String, rejectLimit: Int,
                                         rejectDir: Option[String])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ExecPartition]
    new PartitionReader[InternalRow] {
      private var proc: Process = _
      private var lines: java.io.BufferedReader = _
      private var row: InternalRow = _
      // parse + reject bookkeeping shared with the other delimited
      // external sources (cdbsreh.c semantics) — see SrehLineParser
      private val sreh =
        new SrehLineParser(schema0, required, delimiter, rejectLimit, rejectDir, p.id)

      private def start(): Unit = {
        val pb = new ProcessBuilder("/bin/sh", "-c", command)
        pb.environment().put("GRAFT_SEGMENT_ID", p.id.toString)
        pb.environment().put("GRAFT_SEGMENT_COUNT", p.count.toString)
        // stderr goes to the executor log (never buffered — an unread
        // stderr pipe would deadlock a chatty command)
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        proc = pb.start()
        lines = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      }

      override def next(): Boolean = {
        if (proc == null) start()
        var line = lines.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            row = sreh.parse(line)
            if (row != null) return true
          }
          line = lines.readLine()
        }
        // EOF: a failed command must FAIL the scan, not read as an empty
        // table (silent data loss — the gpfdist client errors the same way)
        val rc = proc.waitFor()
        if (rc != 0) throw new IllegalStateException(
          s"exec source command exited with $rc in partition ${p.id}")
        false
      }

      override def get(): InternalRow = row

      override def close(): Unit = {
        sreh.flush()
        if (proc != null) proc.destroy()
      }
    }
  }
}
