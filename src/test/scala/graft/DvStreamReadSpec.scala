package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{DeletionVectors => DV, Snapshots}

/** Streaming READS of a graft-dv table — the Delta streaming-source
  * shape: `spark.readStream.format("graft-dv")` (and
  * `spark.readStream.table("graftdv.`/root`")` through the catalog's
  * V1 streaming fallback) serves the full masked snapshot as the
  * first batch, then each committed version's INSERT rows; offsets
  * are manifest versions, so the engine's offset log gives
  * exactly-once across restarts. Content-invariant maintenance emits
  * nothing; row-rewriting commits fail loudly unless `ignoreChanges`.
  */
class DvStreamReadSpec extends SparkSpec {

  private def fresh(): (String, DataFrame) = {
    val root = Files.createTempDirectory("graft_dvsrd").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(200)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    (root, ev)
  }

  private def drain(readFace: org.apache.spark.sql.DataFrame,
      ckpt: String, out: String): Unit = {
    val q = readFace.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000): Unit finally q.stop()
  }

  test("initial snapshot + per-commit insert tail, exactly once " +
      "across restarts; maintenance emits nothing; deletes surface " +
      "as the retroactive mask on the snapshot, never as rows") {
    val (root, ev) = fresh()
    // a pre-stream delete: the snapshot must be the MASKED read
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))
    val ckpt = Files.createTempDirectory("graft_dvsrd_ck").toString
    val out = Files.createTempDirectory("graft_dvsrd_out").toString
    def face() = spark.readStream.format("graft-dv")
      .option("path", root)
      .option("startingVersion", Snapshots.latestVersion(
        spark, DV.manifestTable(root)).get)
      .load()

    drain(face(), ckpt, out)
    val snap = ev.filter(col("user_id") % 5 =!= 0)
    assert(spark.read.parquet(out).count() == snap.count(),
      "the first batch is the masked snapshot")

    // two appends -> two tailed batches of exactly the new rows
    val a1 = ev.limit(30)
      .withColumn("event_id", col("event_id") + 7000000L)
    DV.append(spark, root, Seq("day"), a1): Unit
    // content-invariant maintenance between commits: emits NOTHING
    DV.compactSmallFiles(spark, root, minBytes = 512L * 1024 * 1024): Unit
    val a2 = ev.limit(10)
      .withColumn("event_id", col("event_id") + 8000000L)
    DV.append(spark, root, Seq("day"), a2): Unit
    drain(face(), ckpt, out)
    assert(spark.read.parquet(out).count() ==
      snap.count() + 40,
      "tail batches carry exactly the appended rows")
    // restart with nothing new: exactly-once, nothing redelivers
    drain(face(), ckpt, out)
    assert(spark.read.parquet(out).count() == snap.count() + 40)
    // the streamed content matches the live table exactly (no
    // rewriting commits happened)
    val got = spark.read.parquet(out)
      .agg(sum(col("event_id"))).head().getLong(0)
    val want = DV.read(spark, root)
      .agg(sum(col("event_id"))).head().getLong(0)
    assert(got == want)
  }

  test("a row-REWRITING commit (upsert) fails the stream loudly by " +
      "default; ignoreChanges streams the new images; the catalog " +
      "face (readStream.table) rides the same source") {
    val (root, ev) = fresh()
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    val ckpt = Files.createTempDirectory("graft_dvsrd_ck2").toString
    val out = Files.createTempDirectory("graft_dvsrd_out2").toString
    def face() = spark.readStream
      .option("startingVersion", 1L)
      .table(s"graftdv.`$root`")
    drain(face(), ckpt, out)
    assert(spark.read.parquet(out).count() == 200,
      "the catalog face serves the initial snapshot")

    DV.upsert(spark, root, "day", "event_id",
      ev.filter(col("event_id") % 7 === 0)
        .withColumn("value", col("value") * 2), None)
    val e = intercept[Exception] { drain(face(), ckpt, out) }
    def chain(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("ignoreChanges")) ||
        chain(t.getCause))
    assert(chain(e),
      s"a rewriting commit must fail with the ignoreChanges hint: $e")

    // opt in: the new images stream. A FRESH stream's initial
    // snapshot reads the starting version under the RETROACTIVE mask
    // (the layer's pinned rule), so the updated keys' OLD images are
    // already excluded and snapshot + images reconstructs the live
    // table EXACTLY — no double-count, a stronger contract than the
    // Delta ignoreChanges shape (where dedupe is the consumer's job)
    val ckpt2 = Files.createTempDirectory("graft_dvsrd_ck3").toString
    val out2 = Files.createTempDirectory("graft_dvsrd_out3").toString
    drain(spark.readStream.format("graft-dv")
      .option("path", root).option("startingVersion", 1L)
      .option("ignoreChanges", "true").load(), ckpt2, out2)
    val streamed = spark.read.parquet(out2)
    assert(streamed.count() == 200,
      "retroactively-masked snapshot + new images = the live table")
    val gotSum = streamed
      .agg(sum(col("value").cast("decimal(28,4)"))).head().getDecimal(0)
    val wantSum = DV.read(spark, root)
      .agg(sum(col("value").cast("decimal(28,4)"))).head().getDecimal(0)
    assert(gotSum.compareTo(wantSum) == 0,
      "the streamed content must equal the live table exactly")
  }
}
