package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, Snapshots}

/** Deletion vectors: O(deleted rows) delete with no data-file write,
  * structural idempotency, threshold purge behind an atomic manifest
  * flip, time travel across the purge, and vacuum GC of dead data
  * files + dead sidecar batches.
  */
class DeletionVectorsSpec extends SparkSpec {

  private def freshTable(): (String, DataFrame) = {
    val root = Files.createTempDirectory("graft_dv_spec").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    DV.init(spark, ev, root, "day")
    (root, ev)
  }

  private def dataFiles(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(DV.dataDir(root)))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toMap
  }

  test("delete touches no data file, masks exactly the victim rows, " +
      "and replays as a no-op") {
    val (root, ev) = freshTable()
    val before = dataFiles(root)
    val victims = ev.select("user_id").distinct()
      .filter(col("user_id") % 7 === 0)
    val expectKept = ev.filter(col("user_id") % 7 =!= 0).count()
    val expectDeleted = ev.count() - expectKept

    val marked = DV.delete(spark, root, "user_id", victims)
    assert(marked == expectDeleted)
    assert(dataFiles(root) == before,
      "a deletion-vector delete must not touch data files")
    assert(DV.read(spark, root).count() == expectKept)
    assert(DV.read(spark, root)
      .filter(col("user_id") % 7 === 0).count() == 0)

    // structural idempotency: deleted rows are invisible to the
    // marking scan, so the replay appends zero tombstones
    assert(DV.delete(spark, root, "user_id", victims) == 0)
    assert(DV.dv(spark, root).count() == expectDeleted)
  }

  test("read agrees with the plain filtered frame, column for column") {
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))
    val got = DV.read(spark, root)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").cast("decimal(28,4)").as("s"))
      .orderBy("event_type").collect()
    val want = ev.filter(col("user_id") % 5 =!= 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").cast("decimal(28,4)").as("s"))
      .orderBy("event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("purge rewrites only files past the threshold, read is " +
      "invariant, and time travel still resolves the pre-purge set") {
    val (root, ev) = freshTable()
    // victims clustered on one day -> that day's files cross the
    // threshold, the rest stay under it
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy("day").count().orderBy(desc("count"), asc("day"))
      .first().getString(0)
    val victims = ev
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .filter(col("user_id") % 2 === 0)
      .select("user_id").distinct()
    DV.delete(spark, root, "user_id", victims)

    val beforeRows = DV.read(spark, root)
      .orderBy("event_id").collect().toSeq
    val manifestBefore = DV.manifest(spark, root)
      .select("file").collect().map(_.getString(0)).toSet
    val vBefore = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get

    val hot = DV.purge(spark, root, "day", 0.3)
    assert(hot.nonEmpty, "expected at least one file past the threshold")
    assert(hot.forall(manifestBefore.contains))

    val manifestAfter = DV.manifest(spark, root)
      .select("file").collect().map(_.getString(0)).toSet
    assert(hot.forall(h => !manifestAfter.contains(h)),
      "purged files must leave the live set")
    assert((manifestBefore -- hot.toSet).subsetOf(manifestAfter),
      "files under the threshold must survive untouched")
    assert(DV.read(spark, root).orderBy("event_id").collect().toSeq
      == beforeRows, "purge must not change the visible table")

    // time travel: the pre-purge manifest still resolves and the old
    // files are still on disk until vacuum
    val old = Snapshots.readVersion(
      spark, DV.manifestTable(root), vBefore)
    assert(old.select("file").collect().map(_.getString(0)).toSet
      == manifestBefore)
    assert(hot.forall(h =>
      new java.io.File(new java.net.URI(h).getPath).exists()))
  }

  test("a crash between staging and the manifest commit leaves the " +
      "visible table unchanged; the rerun repairs") {
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val beforeRows = DV.read(spark, root).count()

    // simulate the crash window: replacement files moved into the data
    // dirs but no manifest committed = orphan files on disk. Build the
    // same state by hand: copy one live file under a purged- name.
    val f = dataFiles(root).keys.head
    val src = java.nio.file.Paths.get(f)
    val dst = src.getParent.resolve("purged-deadbeef-9.parquet")
    java.nio.file.Files.copy(src, dst)

    assert(DV.read(spark, root).count() == beforeRows,
      "orphan replacement files must be invisible to readers")
    val hot = DV.purge(spark, root, "day", 0.2)
    assert(hot.nonEmpty)
    assert(DV.read(spark, root).count() == beforeRows,
      "rerun purge over the orphan state must still be invariant")
  }

  test("deleting every row, then purging at threshold 0, leaves an " +
      "empty but readable table; further deletes are no-ops") {
    val (root, ev) = freshTable()
    val everyone = ev.select("user_id").distinct()
    val marked = DV.delete(spark, root, "user_id", everyone)
    assert(marked == ev.count())
    assert(DV.read(spark, root).count() == 0)

    val hot = DV.purge(spark, root, "day", 0.0)
    assert(hot.nonEmpty, "every file is past a zero threshold")
    assert(DV.manifest(spark, root).count() == 0,
      "all-victim files must leave the manifest with no replacement")
    assert(DV.read(spark, root).count() == 0)
    assert(DV.read(spark, root).columns.contains("event_type"),
      "empty table must keep its schema")
    assert(DV.delete(spark, root, "user_id", everyone) == 0)
  }

  test("upsert: exactly one image per key, existing files untouched, " +
      "orphan appended files invisible until the manifest commit, " +
      "and purge composes over the mixed manifest") {
    val (root, ev) = freshTable()
    val before = dataFiles(root)

    val updates = ev.filter(col("event_id") % 4 === 0)
      .withColumn("value", col("value") * 2)
    val inserts = ev.filter(col("event_id") % 25 === 0)
      .withColumn("event_id", col("event_id") + lit(1000000000L))
    val (masked, newFiles) = DV.upsert(spark, root, "day", "event_id",
      updates.unionByName(inserts))
    assert(masked == updates.count(), "every updated key tombstoned once")
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(f => !before.contains(
      new java.net.URI(f).getPath)), "appends must be NEW files")
    assert(before.forall { case (p, len) =>
      new java.io.File(p).length() == len }, "existing files untouched")

    // exactly one image per key, new values served
    val got = DV.read(spark, root)
    assert(got.count() == ev.count() + inserts.count())
    assert(got.groupBy("event_id").count().filter(col("count") > 1)
      .count() == 0, "a key is doubled — old image leaked past its tombstone")
    val expect = ev.withColumn("value",
        when(col("event_id") % 4 === 0, col("value") * 2)
          .otherwise(col("value")))
      .unionByName(inserts)
    assert(got.agg(sum(col("value").cast("decimal(28,4)"))).head() ==
      expect.agg(sum(col("value").cast("decimal(28,4)"))).head())

    // an orphan appended file (crash before the manifest commit,
    // simulated by copying a new file under an uncommitted name)
    // must stay invisible
    val orphanSrc = java.nio.file.Paths.get(
      new java.net.URI(newFiles.head).getPath)
    java.nio.file.Files.copy(orphanSrc,
      orphanSrc.getParent.resolve("upsert-deadbeef-9.parquet"))
    assert(DV.read(spark, root).count() == ev.count() + inserts.count())

    // threshold purge over the mixed manifest keeps the answer
    val rows = DV.read(spark, root).orderBy("event_id").collect().toSeq
    DV.purge(spark, root, "day", 0.2)
    assert(DV.read(spark, root).orderBy("event_id").collect().toSeq == rows)
  }

  test("time travel semantics as documented: deletes are retroactive " +
      "(no resurrection at old versions); pre-upsert reads show " +
      "updated keys absent, not at old values") {
    val (root, ev) = freshTable()
    val v1 = Snapshots.latestVersion(spark, DV.manifestTable(root)).get

    // upsert advances the manifest; delete does not
    val updates = ev.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") * 2)
    DV.upsert(spark, root, "day", "event_id", updates)
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 7 === 0))

    // historical read = old manifest + CURRENT sidecar
    val v1Files = Snapshots.readVersion(spark, DV.manifestTable(root), v1)
      .select("file").collect().map(_.getString(0)).toSeq
    val asOfV1 = DV.readFiles(spark, root, v1Files)

    assert(asOfV1.filter(col("user_id") % 7 === 0).count() == 0,
      "time travel resurrected an erased user")
    assert(asOfV1.filter(col("event_id") % 5 === 0).count() == 0,
      "pre-upsert read must show updated keys absent (documented), " +
        "not at their old values")
    // untouched rows still read historically
    assert(asOfV1.count() ==
      ev.filter(col("user_id") % 7 =!= 0)
        .filter(col("event_id") % 5 =!= 0).count())
  }

  test("skipping-index composition: a tombstoned needle is still " +
      "bloom-found but masked; a surviving needle comes back") {
    import graft.operators.SkippingIndex
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val live = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0)).toSeq
    val idx = Files.createTempDirectory("graft_dv_keyidx").toString
    SkippingIndex.buildStats(spark,
      spark.read.option("basePath", DV.dataDir(root)).parquet(live: _*),
      idx, "event_id")

    val dead = ev.filter(col("user_id") % 3 === 0)
      .select("event_id").orderBy("event_id").first().getLong(0)
    val alive = ev.filter(col("user_id") % 3 =!= 0)
      .select("event_id").orderBy("event_id").first().getLong(0)

    val (cDead, _) = SkippingIndex.candidates(spark, idx, Seq(dead))
    assert(cDead.nonEmpty, "the index must still locate the dead row's file")
    assert(DV.readFiles(spark, root, cDead)
      .filter(col("event_id") === dead).count() == 0,
      "tombstoned needle leaked through the composition")

    val (cAlive, _) = SkippingIndex.candidates(spark, idx, Seq(alive))
    assert(DV.readFiles(spark, root, cAlive)
      .filter(col("event_id") === alive).count() ==
      ev.filter(col("event_id") === alive).count())
  }

  test("vacuum deletes dead data files and dead sidecar batches; " +
      "the live table is untouched") {
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val hot = DV.purge(spark, root, "day", 0.2)
    assert(hot.nonEmpty)
    val rows = DV.read(spark, root).count()
    val dvBatchesBefore = new java.io.File(DV.dvDir(root))
      .listFiles().count(_.getName.endsWith(".parquet"))

    val (dataGone, dvGone) = DV.vacuum(spark, root, keepVersions = 1)
    assert(dataGone == hot.size.toLong,
      "exactly the purged files are unreferenced by the kept manifest")
    hot.foreach(h => assert(
      !new java.io.File(new java.net.URI(h).getPath).exists()))
    assert(DV.read(spark, root).count() == rows)

    // every tombstone referenced a since-purged file (victims were a
    // key-spread %3 so every file got some), so the sidecar batch
    // whose entries are all dead is reclaimable iff its files all died
    val liveRefs = DV.dv(spark, root).select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val live = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0)).toSet
    if (liveRefs.forall(r => !live.contains(r)))
      assert(dvGone == dvBatchesBefore.toLong)
    else assert(dvGone <= dvBatchesBefore.toLong)
  }
}
