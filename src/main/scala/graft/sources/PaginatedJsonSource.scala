package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 (main.py:60-90): the paginated-REST scan as a DataSource V2 table.
  *
  * The reference loops `GET ?page=N&pageSize=100` on one thread,
  * accumulating `data` arrays while `total > page*page_size` (main.py:75,89).
  * Here the pagination *is the partition planning*: each page envelope
  * (fetched to a spool directory by an edge process — tasks never do
  * network I/O) becomes one `InputPartition`, so N pages scan with N-way
  * parallelism and the `more` predicate disappears into `planInputPartitions`.
  *
  * Usage: spark.read.format("graft.sources.PaginatedJsonSource")
  *                  .option("path", dir).load()
  * where dir contains one `*.json` envelope per page
  * (`{"data": [{id,name,tags}...], "pagination": {...}}` — FIXTURES.md A2).
  *
  * Scale: pages are independent splits; schema is fixed (no inference pass);
  * column pruning happens via the projection above the scan (the row width
  * here is 3 narrow columns, so pushdown is not load-bearing).
  */
class PaginatedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PaginatedJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PaginatedJsonTable(properties.get("path"))
}

object PaginatedJsonSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("tags", ArrayType(StringType), nullable = true)))
}

class PaginatedJsonTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paginated_json($path)"
  override def schema(): StructType = PaginatedJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      private var required: StructType = PaginatedJsonSource.schema
      private var pushed: Array[Filter] = Array.empty
      // column pruning: the projection above the scan reaches the reader,
      // which then parses only the requested fields per page row
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      // filter pushdown — the engine-side analogue of the reference's
      // server-side query-param filtering (slug main.py:32, assemblyID
      // main.py:62): string-equality predicates are evaluated inside the
      // reader while parsing, everything else stays a post-scan Filter
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (accepted, rejected) = filters.partition {
          case EqualTo(a, _: String) => a == "id" || a == "name"
          case _ => false
        }
        pushed = accepted
        rejected
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def description(): String =
        s"PaginatedJsonScan pushedFilters=[${pushed.mkString(", ")}], " +
          s"readSchema=[${required.fieldNames.mkString(", ")}]"
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // one partition per page file — the reference's `while more` loop
        // (main.py:75-89) turned into split planning
        val eqs = pushed.collect { case EqualTo(a, v: String) => (a, v) }
        val dir = new java.io.File(path)
        val pages = Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".json")).map(_.getAbsolutePath).sorted
        pages.map(p => PagePartition(p, required.fieldNames.toIndexedSeq, eqs.toIndexedSeq): InputPartition)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new PageReaderFactory
    }
}

case class PagePartition(file: String, fields: Seq[String],
                         eqFilters: Seq[(String, String)]) extends InputPartition

class PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PageReader(p.file, p.fields, p.eqFilters)
  }
}

/** Parses one page envelope with Jackson (ships with Spark) and emits the
  * `data` array rows. */
class PageReader(file: String, fields: Seq[String],
                 eqFilters: Seq[(String, String)] = Nil)
    extends PartitionReader[InternalRow] {
  private val rows: Iterator[JsonNode] = {
    val root = new ObjectMapper().readTree(new java.io.File(file))
    val data = root.get("data")
    val all = if (data == null || !data.isArray) Iterator.empty else data.elements().asScala
    all.filter(n => eqFilters.forall { case (f, v) =>
      val x = n.get(f); x != null && !x.isNull && x.asText() == v
    })
  }
  private var current: JsonNode = _

  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  private def utf8(n: JsonNode, field: String): UTF8String = {
    val v = n.get(field)
    if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
  }

  override def get(): InternalRow = {
    val values: Seq[Any] = fields.map {
      case "tags" =>
        val tagsNode = current.get("tags")
        if (tagsNode == null || !tagsNode.isArray) null
        else new GenericArrayData(tagsNode.elements().asScala
          .map(t => if (t.isNull) null else UTF8String.fromString(t.asText())).toArray[Any])
      case f => utf8(current, f)
    }
    InternalRow(values: _*)
  }

  override def close(): Unit = ()
}
