package graft.sources

import org.apache.spark.sql.{DataFrame, GraftPlanApi, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{DeletionVectors, Snapshots}

/** CHANGE DATA FEED (streaming face): subscribe a Structured Streaming
  * query to a [[graft.operators.DeletionVectors]] table's committed
  * changes — the Delta CDF shape, wrapping the batch face
  * ([[DeletionVectors.readChanges]]):
  *
  * {{{
  *   spark.readStream.format("graft-dv-cdf")
  *     .option("path", root)
  *     .option("startingVersion", v)   // committed version; changes
  *     .load()                         // strictly AFTER it (default:
  *                                     // latest at stream start)
  * }}}
  *
  * OFFSETS ARE MANIFEST VERSIONS. Each micro-batch covers the
  * committed versions `(startOffset, endOffset]` and its rows are
  * exactly `readChanges(start, end)` — so the feed inherits the fold
  * law (a consumer folding the batches reconstructs the endpoint
  * snapshot diff) and exactly-once delivery rides the engine's offset
  * log: a replayed batch re-reads the SAME immutable committed
  * manifests and blobs, producing the same rows.
  *
  * DSv1 `Source` deliberately (not DSv2): its `getBatch` contract IS
  * a DataFrame, so the masked manifest-fed scan plan serves the
  * stream unchanged — a DSv2 `MicroBatchStream` would force the read
  * path down into bare `PartitionReader`s, re-implementing the scan.
  * The one DSv1 obligation is tagging the frame streaming
  * ([[GraftPlanApi.asStreaming]]).
  *
  * Scale: `getOffset` is one `_commits` listing; a batch's cost is a
  * shuffle over its TOUCHED files' rows, never the table. Vacuum
  * bounds history — a consumer further behind than the retention
  * window fails loudly on the vacuumed version (the standard CDF
  * retention contract), never silently skips.
  */
class DvCdfSource extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-dv-cdf"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-dv-cdf requires a path option (the DV table root)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      DvCdfSource.changeSchema(sqlContext, rootOf(parameters)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    val spark = sqlContext.sparkSession
    val starting = parameters.get("startingVersion").map(_.toLong)
      .getOrElse(Snapshots.latestVersion(
        spark, DeletionVectors.manifestTable(root)).getOrElse(
        throw new IllegalStateException(
          s"no committed graft-dv manifest at $root")))
    new Source {
      override val schema: StructType =
        DvCdfSource.changeSchema(sqlContext, root)

      private def vOf(o: OffsetV1): Long = o match {
        case l: LongOffset => l.offset
        case s: SerializedOffset => LongOffset(s).offset
        case other => other.json.toLong
      }

      override def getOffset: Option[OffsetV1] =
        Snapshots.latestVersion(spark, DeletionVectors.manifestTable(root))
          .filter(_ > starting).map(LongOffset.apply)

      override def getBatch(start: Option[OffsetV1],
          end: OffsetV1): DataFrame = {
        val fromV = start.map(vOf).getOrElse(starting)
        val changes = DeletionVectors.readChanges(
          spark, root, fromV, vOf(end))
        // schema evolution mid-stream: the engine pinned this source's
        // schema at start — steps carrying new columns align to it
        // (added columns surface after a stream restart)
        val aligned = schema.fieldNames.foldLeft(changes) { (df, c) =>
          if (df.columns.contains(c)) df
          else df.withColumn(c, org.apache.spark.sql.functions.lit(null)
            .cast(schema(c).dataType))
        }.select(schema.fieldNames.map(
          org.apache.spark.sql.functions.col).toSeq: _*)
        GraftPlanApi.asStreaming(spark, aligned)
      }

      override def stop(): Unit = ()
    }
  }
}

object DvCdfSource {
  /** Table columns + the two change columns. */
  private[sources] def changeSchema(sqlContext: SQLContext,
      root: String): StructType = {
    val base = DeletionVectors.read(sqlContext.sparkSession, root).schema
    StructType(base.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false),
      StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType, nullable = true)))
  }
}
