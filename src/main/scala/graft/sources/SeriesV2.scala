package graft.sources.seriesv2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 series generator — the extension-surface analogue of the
  * reference's `TableScanFunction` (async bind -> partitioned pull with
  * projection pushdown, `functions/table/scan.rs:25-44`) and its
  * `generate_series` TVF (`functions/table/builtin/series.rs:19`).
  *
  * Read with:
  * {{{
  * spark.read.format("graft.sources.seriesv2.SeriesSource")
  *   .option("start", 1).option("end", 101).option("partitions", 8).load()
  * }}}
  *
  * Schema: id BIGINT, id_sq BIGINT, id_str STRING. Implements
  * SupportsPushDownRequiredColumns: unprojected columns are never
  * materialized (verified by the pruning spec). Partitioned: the range is
  * split into `partitions` independent splits — reader-side parallelism
  * identical to what a real remote scan function would do.
  */
class SeriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.fullSchema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeriesTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "10").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SeriesSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("id_sq", LongType, nullable = false),
    StructField("id_str", StringType, nullable = false)))
}

class SeriesTable(start: Long, end: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"series($start, $end)"
  override def schema(): StructType = SeriesSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(start, end, partitions)
}

class SeriesScanBuilder(start: Long, end: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SeriesSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeriesScan(start, end, partitions, required)
}

case class SeriesSplit(lo: Long, hi: Long) extends InputPartition

class SeriesScan(start: Long, end: Long, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(partitions, 1)
    val step = math.max((end - start) / n, 1L)
    (0 until n).map { i =>
      val lo = start + i * step
      val hi = if (i == n - 1) end else math.min(lo + step, end)
      SeriesSplit(lo, hi)
    }.filter(s => s.hi > s.lo).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory(required.fieldNames)
}

class SeriesReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[SeriesSplit]
    new PartitionReader[InternalRow] {
      private var cur = s.lo - 1
      override def next(): Boolean = { cur += 1; cur < s.hi }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "id" => cur: java.lang.Long
          case "id_sq" => (cur * cur): java.lang.Long
          case "id_str" => UTF8String.fromString(s"row_$cur")
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
