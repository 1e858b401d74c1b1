package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** PG `COPY ... (FORMAT BINARY)` reader — the binary branch of the
  * reference's COPY surface (`src/backend/commands/copy.c` +
  * `copyfromparse.c` CopyReadBinaryAttribute; wire layout documented in
  * PG's COPY docs): an 11-byte signature `PGCOPY\n\377\r\n\0`, int32
  * flags (bit 16 = OIDs, long gone — rejected here), int32 header-
  * extension length, then per tuple an int16 field count and per field
  * an int32 byte length (-1 = NULL) + payload; int16 -1 terminates.
  * Field payloads are big-endian typed values: int8 → 8-byte two's
  * complement, float8 → IEEE 754 bits, text → UTF-8.
  *
  * Spark rendition: a DSv2 batch source with ONE INPUT PARTITION PER
  * FILE (COPY's parallel-load unit is per-segment files), each streamed
  * through a DataInputStream — no whole-file buffering, no driver
  * materialization. sreh semantics ([[SrehRejects]], cdbsreh.c): a tuple
  * whose field count or fixed-width field length doesn't match the
  * declared columns is diverted (its remaining fields are skipped by
  * their self-describing lengths, so the stream stays in sync); a
  * corrupt signature/flags or a truncated stream is structural and FAILS
  * the scan.
  *
  * Options: `path` (a directory of `.bin` files or one file), `columns`
  * (`"i bigint, v double, tag string"`), `reject_limit`, `reject_dir`.
  *
  * The write side ([[PgCopyBinary.writeDf]]) is the `COPY TO (FORMAT
  * BINARY)` counterpart: executor-side, one file per partition.
  */
object PgCopySource {
  /** Plausibility cap on a single field's self-described byte length —
    * mirrors the 4096 field-count cap: corrupt streams fail structurally
    * instead of attempting a multi-GB allocation. 64 MiB comfortably
    * exceeds any real COPY BINARY field (PG's own limit is 1 GB varlena,
    * but nothing in this engine's schemas approaches that). */
  val MaxFieldBytes: Int = 64 * 1024 * 1024
}

class PgCopySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExecSource.parseColumns(options.getOrDefault("columns", "line string"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.getOrDefault("path", "")
    require(path.nonEmpty, "pgcopy source requires `path`")
    new PgCopyTable(
      ExecSource.parseColumns(opts.getOrDefault("columns", "line string")),
      path,
      opts.getOrDefault("reject_limit", "0").toInt,
      Option(opts.get("reject_dir")))
  }
}

private[sources] class PgCopyTable(schema0: StructType, path: String,
                                   rejectLimit: Int, rejectDir: Option[String])
  extends Table with SupportsRead {
  override def name(): String = s"pgcopy($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PgCopyScanBuilder(schema0, path, rejectLimit, rejectDir)
}

private[sources] class PgCopyScanBuilder(full: StructType, path: String,
                                         rejectLimit: Int, rejectDir: Option[String])
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new PgCopyScan(full, required, path, rejectLimit, rejectDir)
}

private[sources] class PgCopyScan(full: StructType, required: StructType,
                                  path: String, rejectLimit: Int,
                                  rejectDir: Option[String])
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"PgCopyScan path=$path cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    val files: Seq[String] =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".bin")).map(_.getPath).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"pgcopy source: no .bin files under $path")
    files.zipWithIndex.map { case (file, i) => PgCopyPartition(i, file) }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PgCopyReaderFactory(full, required, rejectLimit, rejectDir)
}

private[sources] case class PgCopyPartition(id: Int, file: String) extends InputPartition

private[sources] class PgCopyReaderFactory(schema0: StructType, required: StructType,
                                           rejectLimit: Int, rejectDir: Option[String])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PgCopyPartition]
    val outIdx: Array[Int] = required.fieldNames.map(schema0.fieldIndex)
    new PartitionReader[InternalRow] {
      private var in: java.io.DataInputStream = _
      private var row: InternalRow = _
      private var done = false
      private var tupleNo = 0L
      private val sreh = new SrehRejects(rejectLimit, rejectDir, p.id)

      private def open(): Unit = {
        in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          java.nio.file.Files.newInputStream(java.nio.file.Paths.get(p.file))))
        val sig = new Array[Byte](PgCopyBinary.Signature.length)
        in.readFully(sig)
        if (!java.util.Arrays.equals(sig, PgCopyBinary.Signature))
          throw new IllegalStateException(
            s"pgcopy: bad signature in ${p.file} (not COPY BINARY output)")
        val flags = in.readInt()
        if ((flags & 0xffff) != 0)
          throw new IllegalStateException(
            s"pgcopy: unsupported critical flags 0x${flags.toHexString} in ${p.file}")
        val extLen = in.readInt()
        if (extLen > 0) in.skipBytes(extLen)
      }

      /** Read one tuple; null = rejected (stream already resynced). */
      private def readTuple(nFields: Int): InternalRow = {
        val vals = new Array[Any](schema0.length)
        var bad: String = null
        var i = 0
        while (i < nFields) {
          val len = in.readInt()
          if (len == -1) {
            // NULL — valid for any column (PG sends -1 lengths for nulls)
            if (i < schema0.length) vals(i) = null
          } else {
            // cap like the field-count check: a corrupt length (e.g. 2 GB)
            // must fail structurally, not as an allocation/OOM
            if (len < 0 || len > PgCopySource.MaxFieldBytes)
              throw new IllegalStateException(
                s"pgcopy: implausible field length $len at tuple $tupleNo in ${p.file} " +
                "(stream out of sync)")
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            if (i < schema0.length && bad == null) {
              schema0.fields(i).dataType match {
                case LongType =>
                  if (len == 8) vals(i) = java.nio.ByteBuffer.wrap(bytes).getLong
                  else bad = s"field ${schema0.fields(i).name}: int8 needs 8 bytes, got $len"
                case DoubleType =>
                  if (len == 8) vals(i) = java.nio.ByteBuffer.wrap(bytes).getDouble
                  else bad = s"field ${schema0.fields(i).name}: float8 needs 8 bytes, got $len"
                case _ => vals(i) = UTF8String.fromBytes(bytes)
              }
            }
          }
          i += 1
        }
        if (nFields != schema0.length && bad == null)
          bad = s"expected ${schema0.length} fields, got $nFields"
        if (bad != null) { sreh.reject(s"tuple#$tupleNo", bad); null }
        else InternalRow.fromSeq(outIdx.toIndexedSeq.map(vals(_)))
      }

      override def next(): Boolean = {
        if (done) return false
        if (in == null) open()
        while (true) {
          val nFields = in.readShort().toInt
          if (nFields == -1) { done = true; return false } // trailer
          if (nFields < 0 || nFields > 4096)
            throw new IllegalStateException(
              s"pgcopy: implausible field count $nFields at tuple $tupleNo in ${p.file} " +
              "(stream out of sync)")
          row = readTuple(nFields)
          tupleNo += 1
          if (row != null) return true
        }
        false
      }

      override def get(): InternalRow = row

      override def close(): Unit = {
        sreh.flush()
        if (in != null) in.close()
      }
    }
  }
}

/** `COPY TO (FORMAT BINARY)` writer — executor-side, one `.bin` file per
  * partition (the writable-external sharding unit), so the write is as
  * parallel as the DataFrame. Long/Double/String columns; null → -1
  * length, exactly what [[PgCopySource]] reads back. */
object PgCopyBinary {
  val Signature: Array[Byte] =
    Array[Byte]('P', 'G', 'C', 'O', 'P', 'Y', '\n', 0xff.toByte, '\r', '\n', 0)

  def writeDf(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val d = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(d)) {
      // overwrite semantics: drop previous shards (CREATE OR REPLACE).
      // Files.list must be closed or the directory fd leaks.
      val stream = java.nio.file.Files.list(d)
      try stream.iterator().forEachRemaining(f =>
        if (f.toString.endsWith(".bin")) java.nio.file.Files.delete(f))
      finally stream.close()
    }
    java.nio.file.Files.createDirectories(d)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(dir, f"part-$pid%05d.bin"))))
      try {
        out.write(Signature)
        out.writeInt(0) // flags
        out.writeInt(0) // header extension length
        rows.foreach { r =>
          out.writeShort(schema.length)
          var i = 0
          while (i < schema.length) {
            if (r.isNullAt(i)) out.writeInt(-1)
            else schema.fields(i).dataType match {
              case LongType => out.writeInt(8); out.writeLong(r.getLong(i))
              case DoubleType => out.writeInt(8); out.writeDouble(r.getDouble(i))
              case StringType =>
                val b = r.getString(i).getBytes("UTF-8")
                out.writeInt(b.length); out.write(b)
              case other => throw new IllegalArgumentException(
                s"pgcopy writer: unsupported type $other")
            }
            i += 1
          }
        }
        out.writeShort(-1) // trailer
      } finally out.close()
    }
  }
}
