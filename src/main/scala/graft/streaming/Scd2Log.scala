package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Bucket-partitioned change-log management for incremental SCD2
  * maintenance ([[Streaming.maintainScd2]]).
  *
  * Layout: `accDir/bucket=<b>/slice=b<batchId>/part-*.parquet` —
  * `bucket` is the state-table bucket ([[graft.operators.Scd2.bucketOf]]),
  * `slice` is one idempotent append unit (`b<batchId>` for a raw
  * micro-batch append, `c<batchId>` for a compacted slice). Because
  * both are REAL partition directories:
  *
  *  - a replayed micro-batch dynamic-overwrites exactly its own
  *    (bucket, slice) partitions — idempotent, never duplicating;
  *  - the per-batch rebuild constructs its read from the touched
  *    buckets' PATHS, so untouched buckets' files are not listed,
  *    opened, or read — per-batch read work is O(touched log), not
  *    O(total history) (the round-6 flaw: a `batch_*` glob filtered
  *    on a DERIVED bucket column scanned the whole log every batch);
  *  - [[compact]] bounds the slice count per bucket, so file-listing
  *    cost cannot grow unboundedly with stream lifetime.
  *
  * Crash-safety is by construction, not locking: the rebuild dedupes
  * the log on `event_id` (change records are uniquely keyed), so the
  * one non-atomic window — a compacted slice written but its input
  * slices not yet deleted — yields duplicate rows that the dedup
  * erases; the next batch's compaction pass retries the deletes.
  * State is always a pure function of the SET of log records.
  */
object Scd2Log {

  /** Compact a bucket once it accumulates more than this many slices
    * (overridable per query via [[Streaming.maintainScd2]]).
    */
  val DefaultCompactAfter = 8

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run `body` under dynamic partition-overwrite mode, restoring the
    * previous setting after.
    */
  def withDynamicOverwrite[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body finally spark.conf.set(key, prev.getOrElse("static"))
  }

  /** Fail fast when `accDir` belongs to a DIFFERENT streaming query
    * lineage than `checkpoint`: a fresh checkpoint restarts batch ids
    * at 0, and its idempotent appends would silently overwrite the
    * existing log's early slices, corrupting the accumulated history
    * the rebuild depends on. The guard pins `accDir` to the query id
    * Spark persists in `<checkpoint>/metadata` (stable across
    * restarts FROM that checkpoint, new on a fresh one) via an
    * `_stream_id` marker file.
    */
  def verifyStreamIdentity(spark: SparkSession, checkpoint: String,
      accDir: String, partPrefix: String = "bucket="): Unit = {
    val cfs = fs(spark, checkpoint)
    val meta = new Path(checkpoint, "metadata")
    // metadata is written at query init, before batch 0 — its absence
    // here would be a Spark invariant violation; skip defensively
    if (!cfs.exists(meta)) return
    val metaJson = readUtf8(spark, meta.toString)
    val idOpt = """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(metaJson)
      .map(_.group(1))
    if (idOpt.isEmpty) return
    val id = idOpt.get
    val afs = fs(spark, accDir)
    val marker = new Path(accDir, "_stream_id")
    if (afs.exists(marker)) {
      val existing = readUtf8(spark, marker.toString).trim
      if (existing != id)
        throw new IllegalStateException(
          s"change-log $accDir was written by streaming query $existing " +
            s"but this checkpoint ($checkpoint) is query $id — a fresh " +
            "checkpoint against an existing log would clobber its early " +
            "slices; point at an empty accDir or restore the original " +
            "checkpoint")
    } else {
      val hasLog = afs.exists(new Path(accDir)) &&
        afs.listStatus(new Path(accDir))
          .exists(_.getPath.getName.startsWith(partPrefix))
      if (hasLog)
        throw new IllegalStateException(
          s"change-log $accDir has existing bucket partitions but no " +
            "_stream_id marker — unknown provenance; refusing to append")
      writeUtf8(spark, marker.toString, id)
    }
  }

  /** Idempotent raw append of one micro-batch, partitioned by
    * (bucket, slice): a replay overwrites exactly its own partitions.
    * `batch` must already carry the `bucket` column.
    */
  def appendSlice(batch: DataFrame, accDir: String, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.lit
    withDynamicOverwrite(batch.sparkSession) {
      batch.withColumn("slice", lit(s"b$batchId"))
        .write.mode("overwrite").partitionBy("bucket", "slice").parquet(accDir)
    }
  }

  /** The accumulated log restricted to `buckets`, built from explicit
    * bucket-directory paths: listing and reading never touch any other
    * bucket (the property the round-6 glob+filter form lacked).
    * Duplicates from replay/compaction races are erased by keying on
    * `event_id`. Also records the files read to `_last_read` (spec
    * hook + per-batch read-ratio telemetry).
    */
  def touchedLog(spark: SparkSession, accDir: String,
      buckets: Seq[Long]): DataFrame = {
    val paths = buckets.sorted.map(b => s"$accDir/bucket=$b")
    val acc = spark.read.option("basePath", accDir).parquet(paths: _*)
    writeUtf8(spark, new Path(accDir, "_last_read").toString,
      acc.inputFiles.sorted.mkString("\n"))
    acc.drop("slice").dropDuplicates("event_id")
  }

  /** Fold each over-threshold touched bucket's slices into a single
    * `slice=c<batchId>` partition, then drop the inputs. The compacted
    * frame is localCheckpointed BEFORE any write or delete so the
    * output never reads the directories being replaced (on replay,
    * `c<batchId>` itself is among the inputs).
    */
  def compact(spark: SparkSession, accDir: String, buckets: Seq[Long],
      batchId: Long, compactAfter: Int, partCol: String = "bucket",
      keyCols: Seq[String] = Seq("event_id")): Unit = {
    val afs = fs(spark, accDir)
    buckets.foreach { b =>
      val bucketPath = new Path(s"$accDir/$partCol=$b")
      val slices = afs.listStatus(bucketPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("slice="))
        .map(_.getPath)
      if (slices.length > compactAfter) {
        val compacted = spark.read
          .option("basePath", accDir).parquet(bucketPath.toString)
          .drop(partCol, "slice").dropDuplicates(keyCols)
          .localCheckpoint(true)
        compacted.write.mode("overwrite")
          .parquet(s"$accDir/$partCol=$b/slice=c$batchId")
        slices.filter(_.getName != s"slice=c$batchId")
          .foreach(p => afs.delete(p, true))
      }
    }
  }

  private def readUtf8(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def writeUtf8(spark: SparkSession, path: String, s: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
