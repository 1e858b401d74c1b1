package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 implementation of PG's `generate_series` as a
  * TABLE source — the reference executes this as a FunctionScan node
  * (`src/backend/executor/nodeFunctionscan.c`; SRF machinery
  * `src/backend/utils/fmgr/funcapi.c`), and its external-table scans
  * (`src/backend/access/external/url_file.c`) are the same "foreign
  * source behind the executor API" pattern this class expresses through
  * Spark's connector API.
  *
  * Unlike the expression-level SRF in `PgFunctions` (q53, which explodes
  * inside a projection), this is a real *scan operator* that Catalyst
  * plans against, with the three properties a 100 TB-grade source must
  * have:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): comparison
  *    predicates on `i` tighten the generated range itself — the source
  *    NEVER materializes rows a `WHERE i BETWEEN a AND b` excludes.
  *    That is the moral equivalent of parquet row-group pruning: work is
  *    skipped at the source, not filtered after the fact. Non-range
  *    filters are declined and stay in the plan.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    derived columns (`sq`, `label`) are only computed when the query
  *    reads them (ReadSchema shrinks, visible in `.explain`).
  *  - **Partitioned planning**: the (post-pushdown) range splits into
  *    `partitions` contiguous slices, each generated independently by an
  *    executor-side [[PartitionReader]] — embarrassingly parallel, no
  *    driver materialization, no shuffle.
  *
  * Columns: `i BIGINT`, `sq BIGINT` (= i*i), `label STRING` (= 'n' ||
  * i % 100). Options: `start`, `end` (inclusive), `partitions`.
  */
class SeriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 option semantics are case-insensitive (inferSchema already gets a
    // CaseInsensitiveStringMap) — wrap the raw map so START/End are honored.
    val opts = new CaseInsensitiveStringMap(properties)
    new SeriesTable(
      opts.getOrDefault("start", "1").toLong,
      opts.getOrDefault("end", "1000").toLong,
      opts.getOrDefault("partitions", "8").toInt)
  }
}

object SeriesSource {
  val schema: StructType = new StructType()
    .add("i", LongType, nullable = false)
    .add("sq", LongType, nullable = false)
    .add("label", StringType, nullable = false)
}

private[sources] class SeriesTable(start: Long, end: Long, partitions: Int)
  extends Table with SupportsRead {
  override def name(): String = s"series($start, $end)"
  override def schema(): StructType = SeriesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(start, end, partitions)
}

private[sources] class SeriesScanBuilder(start: Long, end: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required: StructType = SeriesSource.schema

  /** Range comparisons on `i` fold into the generation bounds; everything
    * else is declined (returned) and evaluated by Spark above the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("i", _: Long) | GreaterThanOrEqual("i", _: Long) |
           LessThan("i", _: Long) | LessThanOrEqual("i", _: Long) |
           EqualTo("i", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("i", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("i", v: Long) => lo = math.max(lo, v)
      case LessThan("i", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("i", v: Long) => hi = math.min(hi, v)
      case EqualTo("i", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case _ =>
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeriesScan(lo, hi, partitions, required)
}

private[sources] class SeriesScan(lo: Long, hi: Long, partitions: Int,
                                  required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SeriesScan range=[$lo, $hi] cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, hi - lo + 1)
    val k = math.max(1, math.min(partitions.toLong, n)).toInt
    val step = (n + k - 1) / k
    (0 until k).iterator
      .map(p => SeriesPartition(lo + p * step, math.min(hi, lo + (p + 1) * step - 1)))
      .filter(p => p.from <= p.to)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory(required)
}

private[sources] case class SeriesPartition(from: Long, to: Long) extends InputPartition

private[sources] class SeriesReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeriesPartition]
    val cols = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = p.from - 1
      override def next(): Boolean = { cur += 1; cur <= p.to }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "i" => cur
          case "sq" => cur * cur
          case "label" => UTF8String.fromString("n" + (cur % 100))
        })
      override def close(): Unit = ()
    }
  }
}
