package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{DeletionVectors => DV}

/** Streaming CDC apply onto a [[graft.operators.DeletionVectors]]
  * table: a stream of change batches (new row images keyed by
  * `keyCol`) merged on-read — per micro-batch, old images are
  * tombstoned and new ones appended, no existing file rewritten, the
  * batch made visible by ONE CAS manifest commit.
  *
  * Exactly-once rides the manifest itself
  * ([[DV.applyCdcBatch]]): every committed manifest carries the
  * highest applied batch id, so a re-delivered batch no-ops BEFORE
  * touching anything, and a batch that crashed mid-apply left only
  * mask-correct tombstones and invisible uncommitted files (vacuum
  * fodder after the grace window) — its rerun completes the commit.
  *
  * Coexistence (round 10 — the round-9 design required a full stream
  * CUTOVER around any purge, because replay detection was version
  * ARITHMETIC that a foreign manifest commit would shift into silent
  * false replays): replay state is now data ON the manifest row set,
  * carried forward by every writer, so purge/vacuum can commit
  * between (or during — the CAS publish rebases) micro-batches while
  * the stream runs. DvCdcSpec pins a purge landing between two
  * batches. The remaining contract is one UPSERTING writer — this
  * stream — per table; deletes and maintenance need no coordination.
  *
  * @param latestBy optional sequencing column resolving multiple
  *        images of one key within a single micro-batch (a file
  *        source's AvailableNow batch easily coalesces several change
  *        files); without it such a batch fails loudly rather than
  *        doubling the key ([[DV.upsert]]'s guard).
  */
object DvCdc {

  def startCdcApply(changes: DataFrame, root: String, partCol: String,
      keyCol: String, checkpoint: String, trigger: Trigger,
      latestBy: Option[String] = None): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DV.applyCdcBatch(batch.sparkSession, root, partCol, keyCol,
          batch, batchId, latestBy): Unit
      }
      .start()
}
