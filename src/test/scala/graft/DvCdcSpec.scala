package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{DeletionVectors => DV, Snapshots}
import graft.streaming.DvCdc

/** Streaming CDC apply onto the deletion-vector table: merge-on-read
  * upserts per micro-batch behind manifest-borne exactly-once —
  * steady state, checkpoint-restart redelivery, replayed-batch
  * no-ops, completion of a crashed mid-apply attempt, and (round 10)
  * a purge committing BETWEEN batches without turning later batches
  * into false replays.
  */
class DvCdcSpec extends SparkSpec {

  test("two change batches apply exactly once; restart redelivers " +
      "nothing; a replayed committed version is a structural no-op") {
    val root = Files.createTempDirectory("graft_dvcdc_tbl").toString
    val drop = Files.createTempDirectory("graft_dvcdc_drop").toString
    val ckpt = Files.createTempDirectory("graft_dvcdc_ckpt").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    DV.init(spark, ev, root, "day")
    val base = Snapshots.latestVersion(spark, DV.manifestTable(root)).get

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = DvCdc.startCdcApply(stream, root, "day", "event_id",
        ckpt, Trigger.AvailableNow())
      try q.awaitTermination(120000) finally q.stop()
    }

    // batch 0: double the value of every %4==0 event (updates only)
    val upd0 = ev.filter(col("event_id") % 4 === 0)
      .withColumn("value", col("value") * 2)
    upd0.write.parquet(s"$drop/b0")
    runOnce()
    assert(DV.read(spark, root).count() == ev.count())
    assert(Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get > base)

    // batch 1: fresh inserts + a second update of the SAME keys
    // (the CDC stream's later image must win)
    val upd1 = ev.filter(col("event_id") % 4 === 0)
      .withColumn("value", col("value") * 3)
    val ins1 = ev.filter(col("event_id") % 20 === 0)
      .withColumn("event_id", col("event_id") + lit(1000000000L))
    upd1.unionByName(ins1).write.parquet(s"$drop/b1")
    runOnce()

    val expect = ev.withColumn("value",
        when(col("event_id") % 4 === 0, col("value") * 3)
          .otherwise(col("value")))
      .unionByName(ins1)
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)), sum(col("value").cast("decimal(28,4)")))
      .head().toSeq
    assert(sums(DV.read(spark, root)) == sums(expect))
    assert(DV.read(spark, root).groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)

    // checkpoint restart with no new files: nothing re-applies
    val vAfter = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get
    val dvAfter = DV.dv(spark, root).count()
    runOnce()
    assert(Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get == vAfter)
    assert(DV.dv(spark, root).count() == dvAfter)
    assert(sums(DV.read(spark, root)) == sums(expect))

    // a re-delivered committed batch no-ops before touching anything
    assert(DV.lastCdcBatch(spark, root) == 1L)
    assert(!DV.applyCdcBatch(spark, root, "day", "event_id", upd1, 1L))
    assert(Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get == vAfter)
    assert(sums(DV.read(spark, root)) == sums(expect))
  }

  test("a purge (and vacuum) committing BETWEEN two stream batches " +
      "does not turn later batches into false replays — the round-9 " +
      "design required a full stream cutover here") {
    val root = Files.createTempDirectory("graft_dvcdc_purge").toString
    val drop = Files.createTempDirectory("graft_dvcdc_pdrop").toString
    val ckpt = Files.createTempDirectory("graft_dvcdc_pckpt").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    DV.init(spark, ev, root, "day")
    // scatter-delete a third of users so purge has hot files
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val kept = ev.filter(col("user_id") % 3 =!= 0)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = DvCdc.startCdcApply(stream, root, "day", "event_id",
        ckpt, Trigger.AvailableNow())
      try q.awaitTermination(120000) finally q.stop()
    }

    // batch 0: updates of surviving keys only (an image of a deleted
    // key would re-insert it and muddy the expected math)
    val upd0 = kept.filter(col("event_id") % 4 === 1)
      .withColumn("value", col("value") * 2)
    upd0.write.parquet(s"$drop/b0")
    runOnce()
    assert(DV.lastCdcBatch(spark, root) == 0L)

    // maintenance lands BETWEEN batches — several manifest commits
    val hot = DV.purge(spark, root, "day", 0.2)
    assert(hot.nonEmpty, "expected hot files to purge")
    DV.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)

    // batch 1 must still apply (round 9: version arithmetic would
    // have classified it as a replay — silent data loss)
    val upd1 = kept.filter(col("event_id") % 4 === 2)
      .withColumn("value", col("value") * 3)
    upd1.write.parquet(s"$drop/b1")
    runOnce()
    assert(DV.lastCdcBatch(spark, root) == 1L,
      "batch after purge was swallowed as a false replay")

    val expect = kept.withColumn("value",
      when(col("event_id") % 4 === 1, col("value") * 2)
        .when(col("event_id") % 4 === 2, col("value") * 3)
        .otherwise(col("value")))
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)), sum(col("value").cast("decimal(28,4)")))
      .head().toSeq
    assert(sums(DV.read(spark, root)) == sums(expect))
    assert(DV.read(spark, root).groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("a crashed mid-apply attempt (tombstones landed, files moved, " +
      "no commit) is completed by its rerun with exactly one image") {
    val root = Files.createTempDirectory("graft_dvcdc_crash").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    DV.init(spark, ev, root, "day")
    val base = Snapshots.latestVersion(spark, DV.manifestTable(root)).get
    val upd = ev.filter(col("event_id") % 6 === 0)
      .withColumn("value", col("value") * 2)

    // simulate the crash window: the attempt's delete ran and its
    // files moved in, but the manifest never committed
    DV.delete(spark, root, "event_id", upd.select("event_id"))
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .orderBy("d").first().getString(0)
    // moved-in orphan files exactly as a crashed attempt leaves them:
    // real parquet under the day dir, upsert-prefixed, in no manifest
    val crashSrc = Files.createTempDirectory("graft_dvcdc_src").toString
    upd.filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .drop("day").write.mode("overwrite").parquet(crashSrc)
    new java.io.File(crashSrc).listFiles()
      .filter(_.getName.endsWith(".parquet")).zipWithIndex
      .foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(
          s"${DV.dataDir(root)}/day=$day/upsert-deadbeef-$i.parquet"))
      }
    assert(DV.read(spark, root)
      .filter(col("event_id") % 6 === 0).count() == 0,
      "masked keys with uncommitted new images — the documented gap")

    // rerun the SAME logical batch: delete re-marks nothing, fresh
    // files append, the commit lands
    val (masked, files) = DV.upsert(spark, root, "day", "event_id", upd)
    assert(masked == 0L, "rerun re-marked already-masked rows")
    assert(files.nonEmpty)
    assert(Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get > base)
    val got = DV.read(spark, root)
    assert(got.count() == ev.count())
    assert(got.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("batch→stream handoff: a fresh streaming query over a table " +
      "whose CDC high-water was set by BATCH applies is a NEW lineage " +
      "— its restarted batch ids apply and take ownership, not vanish") {
    val root = Files.createTempDirectory("graft_dvcdc_hand").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(200)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    // three BATCH applies (no streaming query id) raise the unowned
    // high-water to 2
    (0L to 2L).foreach { b =>
      val ins = ev.limit(10)
        .withColumn("event_id", col("event_id") + lit((b + 1) * 10000000L))
      assert(DV.applyCdcBatch(spark, root, "day", "event_id", ins, b))
    }
    assert(DV.cdcHighWater(spark, root) == ((2L, None)))
    val countBefore = DV.read(spark, root).count()

    // a streaming query (id on the local property, as StreamExecution
    // sets it) starts from ITS batch 0 — below the unowned high-water.
    // Pre-fix this was swallowed as a replay: acknowledged-data loss.
    val qid = "handoff-test-qid"
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", qid)
    try {
      assert(!DV.isStreamReplay(spark, root, 0L),
        "a fresh stream over a batch-set high-water is a new lineage")
      val ins0 = ev.limit(15)
        .withColumn("event_id", col("event_id") + lit(90000000L))
      assert(DV.applyCdcBatch(spark, root, "day", "event_id", ins0, 0L),
        "the stream's batch 0 must apply, not vanish")
      assert(DV.read(spark, root).count() == countBefore + 15)
      // ownership handed over, high-water reset to the stream's id
      assert(DV.cdcHighWater(spark, root) == ((0L, Some(qid))))
      // and the new lineage's own replays still dedup
      assert(!DV.applyCdcBatch(spark, root, "day", "event_id", ins0, 0L))
      assert(DV.read(spark, root).count() == countBefore + 15)
    } finally
      spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
  }
}
