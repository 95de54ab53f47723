package graft

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, DvBlobs}

/** Round-16 advisory regressions (round-15 ADVICE.md, high):
  *
  * '''journal-first publish with partial-state-gated replay''' — the
  * r14 publish-first ordering left a window (first blob renamed live,
  * intent write failed / process died) where a failed statement's
  * tombstones stuck half-applied FOREVER: no intent existed, so
  * replayIntents could never finish the remaining blobs, and for a
  * CDF DELETE the 'del' sidecar was never committed. The intent is
  * now journaled BEFORE any publish, and replayIntents enforces
  * "partial state is the only roll-forward trigger" itself: an
  * intent none of whose journaled destinations exists belongs to a
  * statement that failed before any publish (and reported failure) —
  * it is DROPPED unapplied; once at least one destination exists the
  * statement is partially applied and replay finishes it.
  */
class Round16AdviceSpec extends SparkSpec {

  private def freshTable(tag: String): (String, Seq[String]) = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_r16_$tag").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300).localCheckpoint()
    DV.init(spark, ev.repartition(4), root, Seq("event_type"))
    val files = DV.manifest(spark, root)
      .select("file").collect().map(_.getString(0)).toSeq
    (root, files)
  }

  test("an intent with NO published destination is dropped unapplied: " +
      "a statement that failed before any publish never rolls forward") {
    val (root, files) = freshTable("drop")
    val before = DV.read(spark, root).count()
    assert(files.size >= 2)
    val pendingRoot = s"$root/_dml_stage_r16drop_dvpending"
    val blobs = files.take(2).map(f =>
      DvBlobs.writeDelta(pendingRoot, f, Array(0L, 1L)))
    DvBlobs.writeIntent(root, blobs): Unit
    // failed-before-any-publish: no journaled destination exists
    assert(!blobs.exists(DvBlobs.publishedDestExists(_, root)))
    assert(DvBlobs.replayIntents(root) == 0,
      "an unapplied intent must be dropped, not replayed")
    assert(DV.read(spark, root).count() == before,
      "no tombstone of the failed statement may go live")
    // the intent is gone: a second replay sees nothing at all
    assert(DvBlobs.replayIntents(root) == 0)
    // and the pending blobs were never renamed live
    assert(!blobs.exists(DvBlobs.publishedDestExists(_, root)))
  }

  test("an intent with at least one published destination is replayed " +
      "to completion (partial state is the roll-forward trigger)") {
    val (root, files) = freshTable("roll")
    val before = DV.read(spark, root).count()
    assert(files.size >= 3)
    val pendingRoot = s"$root/_dml_stage_r16roll_dvpending"
    val blobs = files.take(3).map(f =>
      DvBlobs.writeDelta(pendingRoot, f, Array(0L)))
    DvBlobs.writeIntent(root, blobs): Unit
    // crash mid-publish: only the first rename landed
    DvBlobs.publish(blobs.head, root): Unit
    assert(DV.read(spark, root).count() == before - 1)
    assert(DvBlobs.replayIntents(root) == 1)
    assert(DV.read(spark, root).count() == before - 3,
      "replay must finish every journaled blob")
    assert(blobs.forall(DvBlobs.publishedDestExists(_, root)))
    assert(DvBlobs.replayIntents(root) == 0)
  }

  test("a clean DSv2 DELETE still converges end-to-end under the " +
      "journal-first ordering (no intent left behind)") {
    val (root, _) = freshTable("e2e")
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    graft.plans.GraftPlans.ensureDvScan(spark)
    try {
      val before = DV.read(spark, root).count()
      val victims = DV.read(spark, root)
        .filter(col("event_id") % 7 === 0).count()
      assert(victims > 0)
      spark.sql(s"DELETE FROM graftdv.`$root` WHERE event_id % 7 = 0")
        .collect(): Unit
      assert(DV.read(spark, root).count() == before - victims)
      // the commit removed its own intent — nothing pending
      val intents = new java.io.File(DvBlobs.intentDir(root))
      assert(!intents.exists() ||
        intents.listFiles().forall(!_.getName.endsWith(".pub")))
    } finally {
      spark.conf.unset("spark.sql.catalog.graftdv")
    }
  }
}
