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

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true").format("parquet").load(drop)
      val q = stream.writeStream.format("graft-dv")
        .option("path", root).option("partitionCol", "day")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000): Unit finally q.stop()
    }

    ev.limit(100).write.parquet(s"$drop/b0")
    runOnce()
    assert(DV.read(spark, root).count() == 100)
    // the batch id rides the manifest's high-water column
    assert(DV.lastCdcBatch(spark, root) == 0L)

    ev.orderBy(desc("event_id")).limit(120).write.parquet(s"$drop/b1")
    runOnce()
    assert(DV.read(spark, root).count() == 220)

    // fresh-checkpoint restart REPLAYS both drops as batch 0: the
    // sink's replay guard must refuse (0 <= high-water 1), appending
    // nothing — at-least-once delivery, exactly-once table effects
    val ckpt2 = Files.createTempDirectory("graft_dvsink_ckpt2").toString
    val before = Snapshots.latestVersion(spark, DV.manifestTable(root)).get
    val stream2 = spark.readStream.schema(ev.schema)
      .option("recursiveFileLookup", "true").format("parquet").load(drop)
    val q2 = stream2.writeStream.format("graft-dv")
      .option("path", root).option("partitionCol", "day")
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow())
      .start()
    try q2.awaitTermination(120000): Unit finally q2.stop()
    assert(DV.read(spark, root).count() == 220,
      "a replayed batch id must append nothing")
    assert(Snapshots.latestVersion(spark, DV.manifestTable(root)).get
      == before)

    // the log: empty init + one append per applied micro-batch
    assert(DV.history(spark, root).select("operation")
      .collect().map(_.getString(0)).toSeq ==
      Seq("init", "append", "append"))
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
