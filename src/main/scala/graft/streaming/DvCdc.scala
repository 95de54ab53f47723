package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{DeletionVectors => DV, Snapshots}

/** Streaming CDC apply onto a [[graft.operators.DeletionVectors]]
  * table (round 9): a stream of change batches (new row images keyed
  * by `keyCol`) merged on-read — per micro-batch, old images are
  * tombstoned and new ones appended, no existing file rewritten, the
  * batch made visible by ONE deterministic manifest commit.
  *
  * Exactly-once: version = base + batchId + 1 through
  * [[Snapshots.publishAt]] — a re-delivered batch finds its version
  * committed and no-ops BEFORE touching anything; a batch that
  * crashed mid-apply left only mask-correct tombstones and invisible
  * uncommitted files (vacuum fodder), and its rerun completes the
  * commit. `base` is the manifest version at FIRST stream start,
  * persisted once via exclusive-create marker (`_cdc_base`) so a
  * checkpoint RESTART derives the same version for the same batch —
  * the [[Streaming]] `publishVersionedMetrics` discipline applied to
  * a table whose init already consumed version 1.
  *
  * Writer contract (the [[Snapshots.publishAt]] rule — deterministic
  * and racing publishers never share a table): while a CDC stream
  * owns the table it is the ONLY manifest writer, because the
  * version arithmetic is what makes replays no-ops — a foreign
  * commit (e.g. [[DV.purge]]'s racing publish) would advance the
  * committed max past future batch versions and turn NEW batches
  * into false replays (silent data loss). Compaction therefore
  * requires a CUTOVER: retire the stream at its last committed
  * batch, purge/vacuum, then start a successor stream with a fresh
  * checkpoint reading only post-cutover changes (its own base marker
  * re-derived after deleting `_cdc_base`). The spec pins the
  * steady-state, restart-redelivery, and crash-mid-apply paths.
  */
object DvCdc {

  private def baseVersion(spark: org.apache.spark.sql.SparkSession,
      root: String): Long = {
    val marker = new Path(s"$root/_cdc_base")
    val f = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(marker)) {
      val base = Snapshots.latestVersion(
        spark, DV.manifestTable(root)).getOrElse(0L)
      try {
        val out = f.create(marker, false)
        out.write(base.toString.getBytes("UTF-8"))
        out.close()
      } catch { case _: java.io.IOException => () } // racer wrote it
    }
    val in = f.open(marker)
    val buf = new Array[Byte](32)
    val n = in.read(buf)
    in.close()
    new String(buf, 0, n, "UTF-8").trim.toLong
  }

  /** Start applying `changes` (a streaming frame of full row images,
    * schema = the table's data schema) as merge-on-read upserts.
    */
  def startCdcApply(changes: DataFrame, root: String, partCol: String,
      keyCol: String, checkpoint: String,
      trigger: Trigger): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val v = baseVersion(spark, root) + batchId + 1
        DV.upsertVersioned(spark, root, partCol, keyCol,
          batch, Some(v)): Unit
      }
      .start()
}
