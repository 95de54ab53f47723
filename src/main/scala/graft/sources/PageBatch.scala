package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Batch scan for the paginated page source ([[PageStream]]) that
  * PARTICIPATES in Catalyst optimization — the part of a custom
  * connector that matters at 100 TB:
  *
  *  - `SupportsPushDownFilters`: predicates on `page` are absorbed by
  *    the source and page partitions that cannot match are NEVER
  *    PLANNED — the DSv2 equivalent of partition pruning. For a real
  *    paged HTTP API this is the difference between fetching 3 pages
  *    and fetching all of them. Non-`page` predicates are returned to
  *    Spark as residuals.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    the projected fields (a real scraper would skip parsing the
  *    other DOM fields).
  *
  * PageBatchSourceSpec asserts both: partition count shrinks under a
  * `page` filter, and the scan description reports the pushed
  * predicates and pruned schema.
  */
final class PageScanBuilder(totalPages: Long, rowsPerPage: Int, pagesPerTrigger: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PageStream.schema

  private def isPageFilter(f: Filter): Boolean = f match {
    case EqualTo("page", _) | GreaterThan("page", _) | GreaterThanOrEqual("page", _) |
        LessThan("page", _) | LessThanOrEqual("page", _) | In("page", _) => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(isPageFilter)
    pushed = sup
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new PageScan(totalPages, rowsPerPage, pagesPerTrigger, pushed, required)
}

final class PageScan(
    totalPages: Long,
    rowsPerPage: Int,
    pagesPerTrigger: Long,
    pushed: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft_pages pushed=[${pushed.mkString(", ")}] columns=[${required.fieldNames.mkString(", ")}]"

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PageMicroBatchStream(totalPages, rowsPerPage, pagesPerTrigger)

  private def pageSurvives(p: Long): Boolean = pushed.forall {
    case EqualTo("page", v: Number)            => p == v.longValue()
    case GreaterThan("page", v: Number)        => p > v.longValue()
    case GreaterThanOrEqual("page", v: Number) => p >= v.longValue()
    case LessThan("page", v: Number)           => p < v.longValue()
    case LessThanOrEqual("page", v: Number)    => p <= v.longValue()
    // null IN-list entries match nothing (three-valued IN is never TRUE
    // on null); non-numeric entries can't match a LongType column
    case In("page", vs) =>
      vs.exists { case v: Number => v.longValue() == p; case _ => false }
    case _                                     => true
  }

  override def planInputPartitions(): Array[InputPartition] =
    (0L until totalPages).filter(pageSurvives)
      .map(p => ProjectedPagePartition(p, rowsPerPage,
        required.fieldNames.map(PageStream.schema.fieldIndex)): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory = ProjectedPageReaderFactory
}

/** One fetched page, plus the indexes of the fields the query needs. */
final case class ProjectedPagePartition(page: Long, rowsPerPage: Int, fieldIdxs: Array[Int])
    extends InputPartition

object ProjectedPageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ProjectedPagePartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rowsPerPage }
      override def get(): InternalRow = {
        val full = PageStream.record(p.page, p.page * p.rowsPerPage + i)
        InternalRow.fromSeq(p.fieldIdxs.toSeq.map(full(_)).map {
          case s: String => UTF8String.fromString(s)
          case other => other
        })
      }
      override def close(): Unit = ()
    }
  }
}
