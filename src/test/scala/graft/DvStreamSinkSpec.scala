package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{DeletionVectors => DV, Snapshots}

/** The keyless STREAMING APPEND face of the DV table
  * (`df.writeStream.format("graft-dv")` — a DSv1 streaming sink) and
  * the reader-option time travel
  * (`spark.read.format("graft-dv").option("versionAsOf", n)`): the
  * DataFrame-API parity of `INSERT INTO` and `VERSION AS OF`.
  */
class DvStreamSinkSpec extends SparkSpec {

  test("writeStream appends per micro-batch exactly once: a restart " +
      "redelivering a committed batch is a structural no-op") {
    val root = Files.createTempDirectory("graft_dvsink_tbl").toString
    val drop = Files.createTempDirectory("graft_dvsink_drop").toString
    val ckpt = Files.createTempDirectory("graft_dvsink_ckpt").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()

    def runOnce(ckptDir: String): String = {
      val stream = spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = stream.writeStream.format("graft-dv")
        .option("path", root).option("partitionCol", "day")
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000): Unit finally q.stop()
      q.id.toString
    }

    ev.limit(100).write.parquet(s"$drop/b0")
    val qid1 = runOnce(ckpt)
    assert(DV.read(spark, root).count() == 100)
    // the (stream id, batch id) pair rides the manifest sentinel —
    // the Delta (appId, version) txn shape
    assert(DV.cdcHighWater(spark, root) == ((0L, Some(qid1))))

    ev.orderBy(desc("event_id")).limit(120).write.parquet(s"$drop/b1")
    assert(runOnce(ckpt) == qid1,
      "the query id is the checkpoint's — stable across restarts")
    assert(DV.read(spark, root).count() == 220)

    // SAME-lineage restart with nothing new: the source replays no
    // files and the sink's high-water holds — exactly-once effects
    val before = Snapshots.latestVersion(spark, DV.manifestTable(root)).get
    runOnce(ckpt): Unit
    assert(DV.read(spark, root).count() == 220)
    assert(Snapshots.latestVersion(spark, DV.manifestTable(root)).get
      == before)

    // FRESH-checkpoint restart re-reads both drops as ITS batch 0 —
    // a NEW lineage, not a replay: the round-11 guard (bare
    // batchId <= high-water) silently swallowed every such batch;
    // now the new query takes ownership of the high-water and its
    // data lands (duplicates are the user's explicit choice when
    // re-pointing a fresh checkpoint at consumed input)
    val ckpt2 = Files.createTempDirectory("graft_dvsink_ckpt2").toString
    val qid2 = runOnce(ckpt2)
    assert(qid2 != qid1)
    assert(DV.read(spark, root).count() == 440,
      "a fresh query lineage must append, not vanish")
    assert(DV.cdcHighWater(spark, root) == ((0L, Some(qid2))),
      "the new lineage owns the high-water, reset to its own batch id")
    // and the new lineage's own replays dedup: rerun with no new files
    runOnce(ckpt2): Unit
    assert(DV.read(spark, root).count() == 440)

    // the log: empty init + one append per applied micro-batch
    assert(DV.history(spark, root).select("operation")
      .collect().map(_.getString(0)).toSeq ==
      Seq("init", "append", "append", "append"))
  }

  test("a 50-batch append stream holds the per-directory file-count " +
      "bound via the opportunistic auto-pack; content stays exact") {
    val root = Files.createTempDirectory("graft_dvsink_pack").toString
    val drop = Files.createTempDirectory("graft_dvsink_pdrop").toString
    val ckpt = Files.createTempDirectory("graft_dvsink_pckpt").toString
    // one constant partition so every batch slivers the SAME dir —
    // the adversarial shape for file-count growth
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(100)
      .withColumn("day", lit("2026-01-01"))
      .localCheckpoint()
    ev.repartition(50).write.mode("overwrite").parquet(drop) // 50 files
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1") // -> one micro-batch per file
      .parquet(drop)
      .writeStream.format("graft-dv")
      .option("path", root).option("partitionCol", "day")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(300000): Unit finally q.stop()

    // content exact across ~50 appends + interleaved packs
    assert(DV.read(spark, root).count() == 100)
    assert(DV.read(spark, root).agg(sum("event_id")).head().getLong(0)
      == ev.agg(sum("event_id")).head().getLong(0))
    // the bound: threshold (16) + the batches since the last fold —
    // never the ~50 files an unpacked run would hold
    val liveFiles = DV.manifest(spark, root).count()
    assert(liveFiles <= DV.DefaultAutoPackFiles + 4,
      s"auto-pack must bound the dir: $liveFiles live files")
    // and the log shows the folds happened through the same commit
    // discipline (compact versions interleaved with the appends)
    assert(DV.history(spark, root).filter(col("operation") === "compact")
      .count() >= 1)
  }

  test("reader options versionAsOf / timestampAsOf time-travel the " +
      "DataFrame face; bad versions fail loudly") {
    val root = Files.createTempDirectory("graft_dvropt").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    Thread.sleep(1200) // commit-marker mtime granularity (~1s local)
    DV.append(spark, root, Seq("day"), ev.limit(40)
      .withColumn("event_id", col("event_id") + 3000000L))

    val v1 = spark.read.format("graft-dv")
      .option("versionAsOf", "1").load(root)
    assert(v1.count() == 300)
    assert(spark.read.format("graft-dv").load(root).count() == 340)

    val t1 = Snapshots.commitInstants(spark, DV.manifestTable(root))(1L)
    val ts = new java.sql.Timestamp(t1).toString
    assert(spark.read.format("graft-dv")
      .option("timestampAsOf", ts).load(root).count() == 300)

    // retroactive rule holds on the option face too
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))
    assert(spark.read.format("graft-dv")
      .option("versionAsOf", "1").load(root).count() ==
      ev.filter(col("user_id") % 5 =!= 0).count())

    intercept[Exception](spark.read.format("graft-dv")
      .option("versionAsOf", "99").load(root).count())
    intercept[Exception](spark.read.format("graft-dv")
      .option("versionAsOf", "1").option("timestampAsOf", ts)
      .load(root).count())
  }
}
