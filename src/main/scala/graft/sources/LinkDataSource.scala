package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for link ingestion (SURVEY.md §7.3 stretch /
  * §4.2.1): `spark.read.format("graft-links").option("query", q)
  * .option("maxArticles", n).load()`.
  *
  * Reproduces the reference's paginated-scrape shape (link_extractor.py:
  * 118-222): each engine is one input partition (the reference's
  * one-thread-per-engine), rows are produced page by page (`pageSize` per
  * "fetch"), and `SupportsPushDownLimit` lets Catalyst push `LIMIT n`
  * INTO the source — pagination stops mid-scroll exactly like the
  * reference's per-page `max_articles` check (O1), instead of fetching
  * everything and discarding. In this zero-egress environment pages are
  * deterministic fixtures; a production impl swaps the page generator for
  * an HTTP pager, keeping partitioning + pushdown.
  */
class LinkDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-links"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LinkDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LinkTable(properties.asScala.toMap)
}

object LinkDataSource {
  val schema: StructType = StructType(Seq(
    StructField("engine", StringType),
    StructField("se_link", StringType),
    StructField("se_title", StringType),
    StructField("se_description", StringType),
    StructField("se_source", StringType)))
  val engines: Seq[String] = Seq("Google", "Bing", "Yahoo")
}

final class LinkTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-links(${props.getOrElse("query", "")})"
  override def schema(): StructType = LinkDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LinkScanBuilder(
      options.getOrDefault("query", props.getOrElse("query", "topic")),
      options.getOrDefault("maxArticles",
        props.getOrElse("maxArticles", "100")).toInt)
}

final class LinkScanBuilder(query: String, maxArticles: Int)
    extends ScanBuilder with SupportsPushDownLimit {
  private var pushedLimit: Int = Int.MaxValue
  override def pushLimit(limit: Int): Boolean = { pushedLimit = limit; true }
  override def build(): Scan = new LinkScan(query,
    math.min(maxArticles, pushedLimit),
    pushedLimit != Int.MaxValue)
}

final class LinkScan(query: String, perEngine: Int, limited: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = LinkDataSource.schema
  override def description(): String =
    s"graft-links query=$query perEngine=$perEngine pushedLimit=$limited"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    LinkDataSource.engines.map(e =>
      LinkInputPartition(e, query, perEngine): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new LinkReaderFactory
}

final case class LinkInputPartition(engine: String, query: String,
                                    perEngine: Int) extends InputPartition

final class LinkReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lp = p.asInstanceOf[LinkInputPartition]
    new LinkPartitionReader(lp.engine, lp.query, lp.perEngine)
  }
}

/** Page-by-page row generator: `fetchPage` is the seam a real HTTP pager
  * fills; the reader stops pulling pages once the (possibly pushed-down)
  * per-engine budget is exhausted.
  */
final class LinkPartitionReader(engine: String, query: String, perEngine: Int)
    extends PartitionReader[InternalRow] {
  private val pageSize = 10
  private val q = query.toLowerCase.replaceAll("\\s+", "-")
  private var emitted = 0
  private var page: Seq[InternalRow] = Seq.empty
  private var pageIdx = 0
  private var pageNo = 0

  private def fetchPage(no: Int): Seq[InternalRow] = {
    val start = no * pageSize
    (start until math.min(start + pageSize, perEngine)).map { i =>
      InternalRow(
        UTF8String.fromString(engine),
        UTF8String.fromString(s"https://news.example.com/$q/article-${i % 50}"),
        UTF8String.fromString(s"$engine result about $query #$i"),
        UTF8String.fromString(s"Search description from $engine for '$query', item $i."),
        UTF8String.fromString(s"source-${i % 7}"))
    }
  }

  override def next(): Boolean = {
    if (emitted >= perEngine) return false
    if (pageIdx >= page.size) {
      page = fetchPage(pageNo)
      pageNo += 1
      pageIdx = 0
      if (page.isEmpty) return false
    }
    true
  }
  override def get(): InternalRow = {
    val r = page(pageIdx)
    pageIdx += 1
    emitted += 1
    r
  }
  override def close(): Unit = ()
}
