package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, Snapshots}

/** Round-15 advisory regressions (this round's ADVICE.md):
  *
  *  - '''zorder pin discipline''': only an UNSCOPED full pass may
  *    (re)pin `_zorder_cols`; a WHERE-scoped pass under a DIFFERENT
  *    key clears the pin (out-of-scope files keep `zordered-` names
  *    earned under the old key), and INCREMENTAL then refuses until a
  *    full pass re-pins — trusting file names clustered by an unknown
  *    key is exactly the hazard the pin guard exists to prevent;
  *  - '''marker durability''': `_zorder_cols` is written tmp+rename,
  *    so a reader never sees a half-written marker;
  *  - '''vacuum vs commit-log fold''': a vacuum's dropFromIndex racing
  *    a commit-triggered checkpointLog must not let the fold (built
  *    from a pre-drop listing) resurrect vacuumed versions into
  *    committedVersions/time travel — both sides now re-check after
  *    their rename and re-drop (raced repeatedly here as a smoke;
  *    SnapshotSpec owns the simulated-store fuzzing).
  */
class Round15AdviceSpec extends SparkSpec {
  import spark.implicits._

  private def pinned(root: String): Option[Seq[String]] = {
    val f = new java.io.File(s"$root/_zorder_cols")
    if (!f.exists()) None
    else {
      val s = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      if (s.isEmpty) None else Some(s.split("\n").toSeq)
    }
  }

  test("scoped ZORDER never re-pins; a scoped pass under a different " +
      "key clears the pin and INCREMENTAL refuses until a full pass " +
      "re-pins") {
    val root = Files.createTempDirectory("graft_r15zpin").toString
    val name = s"r15zpin_${math.abs(root.hashCode)}"
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300).localCheckpoint()
    DV.init(spark, ev.repartition(4), root, Seq("event_type"),
      statsCols = Seq("user_id", "value"))
    spark.sql(s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    val t0 = ev.select("event_type").distinct().orderBy("event_type")
      .head().getString(0)

    // full pass pins
    graft.GraftSql.sql(spark, s"OPTIMIZE $name ZORDER BY (user_id)")
      .collect(): Unit
    assert(pinned(root).contains(Seq("user_id")))

    // scoped pass under the SAME key: pin stays (still valid)
    graft.GraftSql.sql(spark, s"OPTIMIZE $name WHERE event_type = '$t0' " +
      "ZORDER BY (user_id)").collect(): Unit
    assert(pinned(root).contains(Seq("user_id")))

    // scoped pass under a DIFFERENT key: pin cleared, not re-pinned —
    // the table now mixes clustering keys file-by-file
    graft.GraftSql.sql(spark, s"OPTIMIZE $name WHERE event_type = '$t0' " +
      "ZORDER BY (value)").collect(): Unit
    assert(pinned(root).isEmpty,
      "a scoped pass under a different key must clear the pin")

    // INCREMENTAL now refuses — clustered-named files, no trustworthy pin
    val ex = intercept[Exception](graft.GraftSql.sql(spark,
      s"OPTIMIZE $name INCREMENTAL ZORDER BY (user_id)").collect())
    assert(ex.getMessage.contains("pinned"),
      s"expected the pin-guard refusal, got: ${ex.getMessage}")

    // a full pass re-pins and incremental works again
    graft.GraftSql.sql(spark, s"OPTIMIZE $name ZORDER BY (value)")
      .collect(): Unit
    assert(pinned(root).contains(Seq("value")))
    graft.GraftSql.sql(spark,
      s"OPTIMIZE $name INCREMENTAL ZORDER BY (value)").collect(): Unit
    assert(spark.table(name).count() == 300)
  }

  test("vacuum racing checkpointLog: vacuumed versions never " +
      "resurrect into committedVersions (repeated thread race)") {
    for (round <- 1 to 3) {
      val t = Files.createTempDirectory("graft_r15race").toString + "/t"
      (1 to 8).foreach(i =>
        Snapshots.publish(spark, t, Seq(i).toDF("x")): Unit)
      // seed one fold so both racers operate over an existing index
      assert(Snapshots.checkpointLog(spark, t, lag = 1, minUnfolded = 1))
      (9 to 12).foreach(i =>
        Snapshots.publish(spark, t, Seq(i).toDF("x")): Unit)

      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      def th(body: => Unit) = new Thread(() =>
        try body catch { case e: Throwable => errs.add(e) })
      val folder = th {
        Snapshots.checkpointLog(spark, t, lag = 1, minUnfolded = 1): Unit
      }
      val vac = th { Snapshots.vacuum(spark, t, keep = 2) }
      folder.start(); vac.start()
      folder.join(60000); vac.join(60000)
      assert(errs.isEmpty, s"round $round racers threw: ${errs.peek()}")

      val committed = Snapshots.committedVersions(spark, t)
      assert(committed == Seq(11L, 12L),
        s"round $round: vacuumed versions resurrected — $committed")
      // and everything that resolves actually reads
      committed.foreach(v =>
        assert(Snapshots.readVersion(spark, t, v).count() == 1))
    }
  }
}
