package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 `MicroBatchStream` replaying paginated "scrape"
  * pages as micro-batches — the streaming form of the reference's S1
  * source (`/root/reference/dags/dag.py:65-119`: a `while` loop over
  * `?page=N` HTTP GETs, 20 records per page, stop at `num_books`).
  *
  * The sandbox has no network, so the page PAYLOAD is a deterministic
  * fixture generator (same dirty-record shape as FIXTURES.md A1 /
  * `RefSurface.rawBooks`: padded titles, "x.y out of 5 stars"
  * ratings, thousands-separator counts). Everything around the
  * payload is the real production shape:
  *
  *  - the OFFSET is the page number (resume-from-checkpoint restarts
  *    at the first unfetched page, exactly as an HTTP scraper would
  *    persist its cursor);
  *  - each micro-batch admits `pagesPerTrigger` pages (admission
  *    control — the reference's one-snapshot-per-cron-run);
  *  - each page is ONE `InputPartition`, so a real paged API fans out
  *    one fetch per task and scales horizontally.
  *
  * Usage:
  * {{{
  * spark.readStream.format(classOf[PageStreamProvider].getName)
  *   .option("pages", "3").option("rowsPerPage", "20").load()
  * }}}
  */
object PageStream {
  val schema: StructType = StructType(Seq(
    StructField("page", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("author", StringType, nullable = false),
    StructField("book_type", StringType, nullable = false),
    StructField("price", StringType, nullable = false),
    StructField("rating", StringType, nullable = false),
    StructField("rating_count", StringType, nullable = false)))

  /** Deterministic dirty record for global row index `n` on `page` —
    * the replayed "scrape" payload.
    */
  def record(page: Long, n: Long): Seq[Any] = {
    val title = s"  B-${n % 97}-${('A' + (n % 3)).toChar}  "
    val author = s"A-${n % 11}"
    val bookType = (n % 3) match {
      case 0 => "Hardcover"
      case 1 => "Paperback"
      case _ => "Kindle"
    }
    val price = f"${10 + n % 40}%d.${n % 100}%02d"
    val rating =
      if (n % 7 == 0) "not rated"
      else s"${1 + n % 4}.${n % 10} out of 5 stars"
    val rc = (n * 37) % 5000
    val ratingCount = if (rc >= 1000) f"${rc / 1000}%d,${rc % 1000}%03d" else rc.toString
    Seq(page, title, author, bookType, price, rating, ratingCount)
  }
}

/** Entry point for `spark.readStream.format(<this class name>)`. */
class PageStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PageStream.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PageTable(
      totalPages = opts.getLong("pages", 3L),
      rowsPerPage = opts.getInt("rowsPerPage", 20),
      pagesPerTrigger = opts.getLong("pagesPerTrigger", 1L))
  }
}

class PageTable(totalPages: Long, rowsPerPage: Int, pagesPerTrigger: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_pages($totalPages x $rowsPerPage)"
  override def schema(): StructType = PageStream.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  // PageScanBuilder (PageBatch.scala) serves both paths: batch scans
  // get filter pushdown + column pruning; toMicroBatchStream keeps the
  // paginated replay semantics for readStream.
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(totalPages, rowsPerPage, pagesPerTrigger)
}

/** Offset = number of fully fetched pages. */
case class PageOffset(page: Long) extends Offset {
  override def json(): String = page.toString
}

class PageMicroBatchStream(totalPages: Long, rowsPerPage: Int, pagesPerTrigger: Long)
    extends MicroBatchStream {

  // pages made available so far; advances by pagesPerTrigger per
  // trigger (admission control). After a restart this re-advances from
  // 0, but commit() fast-forwards it to the checkpointed cursor first,
  // so already-committed pages are never re-planned.
  private var available: Long = 0L

  override def initialOffset(): Offset = PageOffset(0L)

  override def latestOffset(): Offset = {
    available = math.min(available + pagesPerTrigger, totalPages)
    PageOffset(available)
  }

  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)

  override def commit(end: Offset): Unit =
    available = math.max(available, end.asInstanceOf[PageOffset].page)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    // one partition per page: a real paged source fetches pages in
    // parallel tasks
    (s until e).map(p => PagePartition(p, rowsPerPage): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory

  override def stop(): Unit = ()
}

case class PagePartition(page: Long, rowsPerPage: Int) extends InputPartition

object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rowsPerPage }
      override def get(): InternalRow = {
        val vals = PageStream.record(p.page, p.page * p.rowsPerPage + i).map {
          case s: String => UTF8String.fromString(s)
          case other => other
        }
        InternalRow.fromSeq(vals)
      }
      override def close(): Unit = ()
    }
  }
}
