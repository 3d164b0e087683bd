package graft.sources.textv2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 whole-file text table with METADATA COLUMNS — the Spark
  * analogue of the reference's `read_text` TVF and its `_filename`/`_rowid`
  * metadata columns (reference `functions/table/builtin/read_text.rs`;
  * metadata exclusion from `*` and NATURAL JOIN per
  * `slt/standard/functions/table/read_text_natural_join.slt`).
  *
  * Spark's `SupportsMetadataColumns` gives exactly the reference semantics
  * for free: `_filename`/`_rowid` resolve by name, are excluded from `*`
  * expansion and NATURAL/USING column matching, and can be projected into
  * CTAS/INSERT targets.
  *
  * Schema: content STRING; metadata: _filename STRING, _rowid BIGINT.
  * One row per file (whole-file read), one input partition per file — at
  * scale each file is an independent split, like the reference's scan.
  */
class TextTable(display: Seq[String], paths: Seq[String])
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"read_text(${display.take(3).mkString(",")})"
  override def schema(): StructType =
    StructType(Seq(StructField("content", StringType, nullable = true)))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_filename"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
    },
    new MetadataColumn {
      override def name(): String = "_rowid"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
    })
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextScanBuilder(display, paths)
}

class TextScanBuilder(display: Seq[String], paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType =
    StructType(Seq(StructField("content", StringType)))
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TextScan(display, paths, required)
}

case class TextSplit(display: String, path: String, rowid: Long)
    extends InputPartition

class TextScan(display: Seq[String], paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    // _rowid is the row index WITHIN each file (reference read_text.slt:61
    // shows 0 for every file) — one row per whole-file read, so always 0
    display.indices.map(i => TextSplit(display(i), paths(i), 0L)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TextReaderFactory(required.fieldNames)
}

class TextReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[TextSplit]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "content" => UTF8String.fromString(new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s.path)),
            java.nio.charset.StandardCharsets.UTF_8))
          case "_filename" => UTF8String.fromString(s.display)
          case "_rowid" => s.rowid: java.lang.Long
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
