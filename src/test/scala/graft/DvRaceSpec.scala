package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV}

/** Concurrency contracts of the round-11-late verbs: pack and zorder
  * REBASE a racing append (its files stay live), restore CONFLICT-
  * DETECTS (one CAS attempt — a rival commit inside the window makes
  * it fail loudly, never silently drop an acknowledged append), and
  * the CHECK-constraint TOCTOU pair (write racing ALTER ADD
  * CONSTRAINT, and the mirror) both re-validate at commit. Races are
  * injected deterministically through the same failpoint hooks purge
  * uses.
  */
class DvRaceSpec extends SparkSpec {

  private def fresh(slivers: Int): (String, org.apache.spark.sql.DataFrame) = {
    val root = Files.createTempDirectory("graft_dvrace").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(240)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    def slice(b: Int) = ev.filter(pmod(col("event_id"),
      lit(slivers.toLong)) === b)
    DV.init(spark, slice(0), root, "day")
    for (b <- 1 until slivers)
      DV.append(spark, root, Seq("day"), slice(b))
    (root, ev)
  }

  private def racer(ev: org.apache.spark.sql.DataFrame, off: Long) =
    ev.limit(25).withColumn("event_id", col("event_id") + off)

  test("an append landing mid-PACK survives: the CAS rebase keeps the " +
      "racer's files live alongside the replacements") {
    val (root, ev) = fresh(6)
    var done = false
    DV.compactSmallFiles(spark, root, onBeforeCommit = () => {
      if (!done) { done = true
        DV.append(spark, root, Seq("day"), racer(ev, 7000000L)): Unit }
    }): Unit
    assert(done, "failpoint must have fired")
    assert(DV.read(spark, root).count() == 240 + 25)
    assert(DV.read(spark, root)
      .filter(col("event_id") >= 7000000L).count() == 25)
  }

  test("an append landing mid-ZORDER survives the rebase the same way") {
    val (root, ev) = fresh(4)
    var done = false
    DV.zorder(spark, root, Seq("user_id"), onBeforeCommit = () => {
      if (!done) { done = true
        DV.append(spark, root, Seq("day"), racer(ev, 8000000L)): Unit }
    }): Unit
    assert(done)
    assert(DV.read(spark, root).count() == 240 + 25)
    assert(DV.read(spark, root)
      .filter(col("event_id") >= 8000000L).count() == 25)
  }

  test("a crash between staging and the CAS leaves pack and zorder " +
      "invisible; the rerun completes; vacuum reclaims the debris") {
    val (root, ev) = fresh(6)
    val mt = DV.manifestTable(root)
    val v0 = graft.operators.Snapshots.latestVersion(spark, mt).get

    intercept[RuntimeException](DV.compactSmallFiles(spark, root,
      onBeforeCommit = () => throw new RuntimeException("boom")))
    assert(graft.operators.Snapshots.latestVersion(spark, mt).get == v0,
      "a crashed pack must not commit")
    assert(DV.read(spark, root).count() == 240)

    intercept[RuntimeException](DV.zorder(spark, root, Seq("user_id"),
      onBeforeCommit = () => throw new RuntimeException("boom")))
    assert(graft.operators.Snapshots.latestVersion(spark, mt).get == v0)
    assert(DV.read(spark, root).count() == 240)

    // reruns claim and complete (the crashed claims were released);
    // the crashed attempts' moved-but-unreferenced files are debris
    // the vacuum age-gate exists for — reclaim with age 0
    assert(DV.compactSmallFiles(spark, root).nonEmpty)
    assert(DV.read(spark, root).count() == 240)
    val (reclaimed, _) = DV.vacuum(spark, root, keepVersions = 1,
      minAgeMs = 0L)
    assert(reclaimed > 0, "the crashed attempts' staged moves are debris")
    assert(DV.read(spark, root).count() == 240)
    assert(DV.read(spark, root).agg(sum("event_id")).head().getLong(0) ==
      ev.agg(sum("event_id")).head().getLong(0))
  }

  test("an append landing mid-RESTORE makes the restore FAIL loudly — " +
      "no acknowledged commit is silently dropped; an explicit re-run " +
      "supersedes it") {
    val (root, ev) = fresh(1)
    DV.append(spark, root, Seq("day"), racer(ev, 9000000L)) // v2
    var done = false
    // the racer commits inside the restore window → the restore's CAS
    // fails and it throws, committing NOTHING: the racer's append
    // stays acknowledged AND live
    intercept[java.util.ConcurrentModificationException](
      DV.restore(spark, root, 1L, onBeforeCas = () => {
        if (!done) { done = true
          DV.append(spark, root, Seq("day"), racer(ev, 9500000L)): Unit }
      }))
    assert(done)
    assert(DV.read(spark, root)
      .filter(col("event_id") >= 9500000L).count() > 0,
      "the racing append must survive the failed restore")
    // re-running is the caller's EXPLICIT choice to supersede the
    // racer: content is exactly v1's, racer files orphaned for vacuum
    val nv = DV.restore(spark, root, 1L)
    assert(nv == 4L)
    assert(DV.read(spark, root).count() == 240)
    assert(DV.read(spark, root)
      .filter(col("event_id") >= 9000000L).count() == 0)
    // the racer's data is intact on disk and recoverable: vacuum with
    // retention reclaims it as unreferenced, touching nothing live
    DV.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    assert(DV.read(spark, root).count() == 240)
    // and the log tells the story
    assert(DV.history(spark, root).orderBy(desc("version"))
      .select("operation").head().getString(0) == "restore")
  }

  test("a CHECK constraint committing mid-APPEND gates that append: " +
      "the CAS rebase re-enforces constraints staging never saw") {
    val (root, ev) = fresh(1)
    // the racer's constraint forbids the in-flight append's rows
    var done = false
    val e = intercept[IllegalArgumentException](
      DV.appendCommitted(spark, root, Seq("day"),
        racer(ev, 9000000L), None, "append", onBeforeCommit = () => {
          if (!done) { done = true
            DV.alterAddConstraint(spark, root, "cap",
              "event_id < 9000000"): Unit }
        }))
    assert(done)
    assert(e.getMessage.contains("cap"))
    assert(DV.read(spark, root).count() == 240,
      "the violating append must not publish")
    assert(DV.read(spark, root)
      .filter(col("event_id") >= 9000000L).count() == 0)
    // a SATISFYING append through the same race window commits fine
    done = false
    DV.appendCommitted(spark, root, Seq("day"),
      racer(ev, 1000L), None, "append", onBeforeCommit = () => {
        if (!done) { done = true
          DV.alterAddConstraint(spark, root, "cap2",
            "event_id < 8000000"): Unit }
      }): Unit
    assert(DV.read(spark, root).count() == 265)
  }

  test("an append landing mid-ALTER ADD CONSTRAINT is re-validated: " +
      "a violating racer fails the alter; a satisfying racer passes") {
    val (root, ev) = fresh(1)
    var done = false
    val e = intercept[IllegalArgumentException](
      DV.alterAddConstraint(spark, root, "cap", "event_id < 9000000",
        onBeforeCommit = () => {
          if (!done) { done = true
            DV.append(spark, root, Seq("day"), racer(ev, 9500000L)): Unit }
        }))
    assert(done)
    assert(e.getMessage.contains("violate"))
    assert(DV.constraintsOf(spark, root).isEmpty,
      "a constraint the live rows violate must not commit")
    assert(DV.read(spark, root).count() == 265,
      "the racing append survives — it committed first")
    // satisfying racer: the delta validation passes and both commit
    done = false
    DV.alterAddConstraint(spark, root, "cap", "event_id < 99000000",
      onBeforeCommit = () => {
        if (!done) { done = true
          DV.append(spark, root, Seq("day"), racer(ev, 2000L)): Unit }
      }): Unit
    assert(DV.constraintsOf(spark, root).keySet == Set("cap"))
    assert(DV.read(spark, root).count() == 290)
  }
}
