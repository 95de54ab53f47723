package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, Snapshots}

/** `DESCRIBE HISTORY` ([[graft.operators.DeletionVectors.history]])
  * and `RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF`
  * ([[graft.operators.DeletionVectors.restore]]) — the manifest-log
  * read face and the forward-only restore, through both the Scala API
  * and the [[graft.GraftSql]] statement surface.
  */
class DvHistorySpec extends SparkSpec {

  private var seq = 0

  private def freshTable(): (String, String,
      org.apache.spark.sql.DataFrame) = {
    seq += 1
    val root = Files.createTempDirectory("graft_dvhist").toString
    val name = s"dvhist_t${seq}_${math.abs(root.hashCode)}"
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    spark.sql(
      s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    (root, name, ev)
  }

  test("history records one row per version with the commit's verb, " +
      "physical live totals, and file-set deltas") {
    val (root, _, ev) = freshTable()
    val n = ev.count()
    DV.append(spark, root, Seq("day"),
      ev.limit(40).withColumn("event_id", col("event_id") + 7000000L))
    // scattered delete (no manifest version), then a threshold purge
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    DV.purge(spark, root, "day", 0.0)

    val h = DV.history(spark, root).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(h.map(_.getString(2)).toSeq == Seq("init", "append", "purge"))
    // live_rows are PHYSICAL (masked rows stay in files until purge)
    assert(h(0).getLong(4) == n)
    assert(h(1).getLong(4) == n + 40)
    val kept = ev.filter(col("user_id") % 3 =!= 0).count() +
      ev.limit(40).filter(col("user_id") % 3 =!= 0).count()
    assert(h(2).getLong(4) == kept)
    // deltas: init adds its whole set; append removes nothing; the
    // threshold-0 purge (every file holds victims) rewrites everything
    assert(h(0).getLong(6) == h(0).getLong(3) && h(0).getLong(7) == 0)
    assert(h(1).getLong(6) > 0 && h(1).getLong(7) == 0)
    assert(h(2).getLong(7) > 0 && h(2).getLong(7) <= h(1).getLong(3),
      "the purge must remove the rewritten originals")
    // commit instants are monotone non-decreasing
    val ts = h.map(_.getTimestamp(1).getTime).toSeq
    assert(ts == ts.sorted)
  }

  test("restore publishes a NEW version serving the old file set; " +
      "tombstones stay retroactive; the log keeps moving forward") {
    val (root, name, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 4 === 0))
    DV.append(spark, root, Seq("day"),
      ev.limit(50).withColumn("event_id", col("event_id") + 9000000L))
    val kept = ev.filter(col("user_id") % 4 =!= 0)

    val nv = DV.restore(spark, root, 1L)
    assert(nv == 3L, "restore must append to history, not rewind it")
    // content = v1's files minus the retroactive deletes
    assert(DV.read(spark, root).count() == kept.count())
    assert(DV.read(spark, root).agg(sum("event_id")).head().getLong(0) ==
      kept.agg(sum("event_id")).head().getLong(0))
    // the pre-restore version is still readable (forward-only
    // history). Tombstones are POSITIONAL and the append landed AFTER
    // the delete, so all 50 appended rows survive the mask even where
    // their user_ids match earlier victims.
    assert(DV.readVersion(spark, root, 2L).count() == kept.count() + 50)
    // restoring to the current content version is a no-op
    assert(DV.restore(spark, root, 3L) == 3L)
    // history records the restore verb
    val ops = DV.history(spark, root).select("operation")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("init", "append", "restore"))
    // SQL face: restore forward to v2 via the catalog name
    graft.GraftSql.sql(spark,
      s"RESTORE TABLE $name TO VERSION AS OF 2").collect()
    assert(spark.table(name).count() == kept.count() + 50)
  }

  test("restore carries the CDC high-water mark FORWARD so an " +
      "exactly-once stream never re-applies a committed batch") {
    val (root, _, ev) = freshTable()
    val chg = ev.limit(20).withColumn("value", col("value") + 100)
    DV.applyCdcBatch(spark, root, "day", "event_id", chg, 7L): Unit
    assert(DV.lastCdcBatch(spark, root) == 7L)
    DV.restore(spark, root, 1L): Unit
    assert(DV.lastCdcBatch(spark, root) == 7L,
      "restoring to a pre-CDC version must NOT rewind the high-water " +
        "mark (a replayed batch would double-apply)")
  }

  test("restore fails loudly when the target's data files are gone, " +
      "and on a never-committed version") {
    val (root, _, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))
    val rewritten = DV.purge(spark, root, "day", 0.0)
    assert(rewritten.nonEmpty)
    // the purged originals are dead-but-present: restore(1) is still
    // possible until something reclaims them — simulate by removing one
    val f = new org.apache.hadoop.fs.Path(rewritten.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(org.apache.spark.sql.GraftDvApi.pathOf(rewritten.head), false)
    val e = intercept[IllegalArgumentException](DV.restore(spark, root, 1L))
    assert(e.getMessage.contains("vacuumed"))
    val e2 = intercept[IllegalArgumentException](DV.restore(spark, root, 99L))
    assert(e2.getMessage.contains("not a committed manifest version"))
  }

  test("DESCRIBE HISTORY and RESTORE ... TIMESTAMP AS OF work as SQL " +
      "statements on the catalog name; non-dv targets fail loudly") {
    val (root, name, ev) = freshTable()
    // commit-marker mtimes have filesystem granularity (~1s on local):
    // space the commits so v1's instant strictly precedes v2's
    Thread.sleep(1200)
    DV.append(spark, root, Seq("day"),
      ev.limit(30).withColumn("event_id", col("event_id") + 1000000L))
    val h = graft.GraftSql.sql(spark, s"DESCRIBE HISTORY $name")
    assert(h.columns.toSeq == Seq("version", "committed_at", "operation",
      "live_files", "live_rows", "live_bytes", "files_added",
      "files_removed", "cdc_batch"))
    val rows = h.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))

    val v1At = Snapshots.commitInstants(
      spark, DV.manifestTable(root))(1L)
    val ts = new java.sql.Timestamp(v1At).toString
    val out = graft.GraftSql.sql(spark,
      s"RESTORE TABLE $name TO TIMESTAMP AS OF '$ts'").collect()
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 3L)
    assert(spark.table(name).count() == ev.count())

    intercept[Exception](graft.GraftSql.sql(spark,
      "DESCRIBE HISTORY no_such_table_xyz").collect())
  }
}
