package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Custom DataSourceV2 source: a paginated extract modeled as one input
  * partition per page — the engine-native form of the reference's
  * concurrent LIMIT/OFFSET SPARQL pagination (S1/S3:
  * run_extraction_pipeline, wikidata_helpers.py:31-118 via
  * /root/reference, which fans pages out over a semaphore; here the
  * cluster scheduler IS the semaphore and each page is a task).
  *
  * Rows are deterministic synthetic records (the network fetch is out of
  * scope, like the reference's record_processor callback): in production
  * the `PageReader.next` body would issue the page request. Usage:
  *
  * {{{
  * spark.read.format("graft.sources.PagedSource")
  *   .option("rows", "1000").option("pageSize", "100").load()
  * }}}
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    new PagedTable(
      opts.getOrElse("rows", "1000").toLong,
      opts.getOrElse("pagesize", "100").toInt)
  }
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

private class PagedTable(rows: Long, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paged(rows=$rows, pageSize=$pageSize)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val nPages = ((rows + pageSize - 1) / pageSize).toInt
        (0 until nPages).map(p => PagePartition(p, pageSize, rows): InputPartition).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
    }
}

private final case class PagePartition(page: Int, pageSize: Int, totalRows: Long)
    extends InputPartition

private object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      // LIMIT/OFFSET window of this page (offset = page * pageSize)
      private var i = p.page.toLong * p.pageSize - 1
      private val end = math.min((p.page + 1L) * p.pageSize, p.totalRows)
      override def next(): Boolean = { i += 1; i < end }
      override def get(): InternalRow =
        // production: one fetched+shaped record; here a deterministic stub
        InternalRow(i, p.page, UTF8String.fromString(s"rec_$i"))
      override def close(): Unit = ()
    }
  }
}
