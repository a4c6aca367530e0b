package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Zero-dependency Excel (`.xlsx`) DataSourceV2 — SURVEY.md §2.1 S1.
  *
  * The reference reads a workbook with `pd.read_excel` (header row
  * inferred, dags/etl_pipeline.py:70); no Excel jar ships in
  * /opt/spark/jars, so this source parses the OOXML zip directly via
  * [[XlsxParser]] (JDK-only). All columns surface as strings — typing is
  * the transform layer's job, same as after the reference's own CSV
  * degrade (etl_pipeline.py:73–74).
  *
  * Scale note: one input partition per file — an xlsx is a monolithic
  * zip (not splittable), and the format only appears at ingest edges
  * with small files; first thing a pipeline does is land it columnar.
  * Column pruning IS pushed down (SupportsPushDownRequiredColumns).
  *
  * Usage: `spark.read.format("xlsx").load(path)` (registered via
  * DataSourceRegister) or [[Sources.excel]].
  */
class ExcelSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "xlsx"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "xlsx source requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(XlsxParser.header(pathOf(options))
      .map(StructField(_, StringType, nullable = true)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ExcelTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

final class ExcelTable(path: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"xlsx:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExcelScanBuilder(path, schema)
}

final class ExcelScanBuilder(path: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with Scan with Batch {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(ExcelInputPartition(path))

  override def createReaderFactory(): PartitionReaderFactory =
    ExcelReaderFactory(fullSchema.fieldNames, required.fieldNames)
}

final case class ExcelInputPartition(path: String) extends InputPartition

final case class ExcelReaderFactory(allColumns: Array[String], requiredColumns: Array[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[ExcelInputPartition].path
    val indices = requiredColumns.map(c => allColumns.indexOf(c))
    // skip the header row; pad/truncate data rows to the header width
    val it = XlsxParser.rows(path, width = allColumns.length).iterator.drop(1)
    new PartitionReader[InternalRow] {
      private var current: Array[String] = _
      override def next(): Boolean = {
        if (it.hasNext) { current = it.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(indices.toSeq.map { i =>
          val v = if (i >= 0 && i < current.length) current(i) else null
          if (v == null) null else UTF8String.fromString(v)
        })
      override def close(): Unit = ()
    }
  }
}
