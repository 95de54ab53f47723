package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{DeletionVectors => DV, Snapshots}
import graft.plans.MvShape
import graft.streaming.MvDmlMaintain

/** Retraction-capable MV maintenance over the DV change data feed:
  * after EVERY DML verb (append / UPDATE / DELETE / MERGE with a
  * delete action) the maintained summary must equal the base
  * aggregate — including MIN/MAX (reset re-derivation) and grains
  * whose last row was deleted (they must vanish). A LAGGING consumer
  * catching up across the whole history must converge to the same
  * answer (the retroactive-mask trap arithmetic negation would fail),
  * replay must be idempotent, and the streaming face must agree with
  * the batch face.
  */
class MvDmlMaintainSpec extends SparkSpec {

  private val grain = Seq("event_type")
  private val shapes = Seq(
    MvShape("sum|v", "sum(cast(value as decimal(28,4)))", "s_v"),
    MvShape("count|1", "count(1)", "n"),
    MvShape("min|v", "min(value)", "mn"),
    MvShape("max|v", "max(value)", "mx"))

  private def baseAgg(root: String): Seq[org.apache.spark.sql.Row] =
    DV.read(spark, root).groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(28,4)")).as("s_v"),
        count(lit(1)).as("n"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .orderBy(col("event_type")).collect().toSeq

  private def mergedOf(mvDir: String): Seq[org.apache.spark.sql.Row] =
    MvDmlMaintain.merged(spark, mvDir, grain, shapes)
      .select(col("event_type"), col("s_v"), col("n"), col("mn"),
        col("mx"))
      .orderBy(col("event_type")).collect().toSeq

  private var seq = 0

  private def freshTable(): (String, String, DataFrame) = {
    seq += 1
    val dir = Files.createTempDirectory(s"graft_mvdml_$seq").toString
    val root = s"$dir/t"
    val name = s"mvdml_t${seq}_${math.abs(dir.hashCode)}"
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    spark.sql(
      s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    (root, name, ev)
  }

  private def runDml(root: String, name: String, ev: DataFrame): Unit = {
    spark.conf.set("spark.graft.dv.cdf", "true")
    try {
      // INSERT: a deterministic disjoint batch
      DV.append(spark, root, Seq("day"),
        ev.limit(40).withColumn("event_id",
          col("event_id") + 7000000L)): Unit
      // UPDATE: shift values of one deterministic stripe
      GraftSql.sql(spark,
        s"UPDATE $name SET value = value + 100 " +
          "WHERE event_id % 5 = 0").collect(): Unit
      // DELETE: retract another stripe
      GraftSql.sql(spark,
        s"DELETE FROM $name WHERE user_id % 4 = 0").collect(): Unit
      // MERGE with update + insert + delete actions
      ev.limit(60)
        .select(col("event_id"), col("value"))
        .createOrReplaceTempView(s"${name}_src")
      GraftSql.sql(spark,
        s"""MERGE INTO $name t USING ${name}_src s
           |ON t.event_id = s.event_id
           |WHEN MATCHED AND t.event_id % 3 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = t.value + s.value
           |""".stripMargin).collect(): Unit
    } finally spark.conf.unset("spark.graft.dv.cdf")
  }

  test("step-wise maintenance: after every DML verb the merged " +
      "summary equals the base aggregate (sum/count AND min/max)") {
    val (root, name, ev) = freshTable()
    val mvDir = s"$root/../mv_step"
    val v0 = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get
    MvDmlMaintain.seed(spark, root, mvDir, grain, shapes, v0)
    assert(mergedOf(mvDir) == baseAgg(root), "seed mismatch")

    spark.conf.set("spark.graft.dv.cdf", "true")
    try {
      var prev = v0
      def step(op: => Unit, tag: String): Unit = {
        op
        MvDmlMaintain.catchUp(spark, root, mvDir, grain, shapes, prev)
        prev = Snapshots.latestVersion(
          spark, DV.manifestTable(root)).get
        assert(mergedOf(mvDir) == baseAgg(root), s"mismatch after $tag")
      }
      step(DV.append(spark, root, Seq("day"),
        ev.limit(40).withColumn("event_id",
          col("event_id") + 7000000L)): Unit, "append")
      step(GraftSql.sql(spark,
        s"UPDATE $name SET value = value + 100 " +
          "WHERE event_id % 5 = 0").collect(): Unit, "update")
      step(GraftSql.sql(spark,
        s"DELETE FROM $name WHERE user_id % 4 = 0").collect(): Unit,
        "delete")
      ev.limit(60).select(col("event_id"), col("value"))
        .createOrReplaceTempView(s"${name}_src")
      step(GraftSql.sql(spark,
        s"""MERGE INTO $name t USING ${name}_src s
           |ON t.event_id = s.event_id
           |WHEN MATCHED AND t.event_id % 3 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = t.value + s.value
           |""".stripMargin).collect(): Unit, "merge")
      // vanish a whole grain: every row of one event_type deleted
      val victim = DV.read(spark, root).select("event_type")
        .orderBy("event_type").head().getString(0)
      step(GraftSql.sql(spark,
        s"DELETE FROM $name WHERE event_type = '$victim'")
        .collect(): Unit, "grain-vanish")
      assert(!mergedOf(mvDir).exists(_.getString(0) == victim),
        "a fully-deleted grain must vanish from the summary")
    } finally spark.conf.unset("spark.graft.dv.cdf")
  }

  test("lagging consumer: catching up across the WHOLE mixed history " +
      "in one pass converges to the base aggregate (the retroactive-" +
      "mask case arithmetic negation gets wrong)") {
    val (root, name, ev) = freshTable()
    val v0 = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get
    runDml(root, name, ev)
    val mvDir = s"$root/../mv_lag"
    MvDmlMaintain.seed(spark, root, mvDir, grain, shapes, v0)
    MvDmlMaintain.catchUp(spark, root, mvDir, grain, shapes, v0)
    assert(mergedOf(mvDir) == baseAgg(root))
  }

  test("replay is idempotent: re-applying the last version's changes " +
      "leaves the summary byte-identical") {
    val (root, name, ev) = freshTable()
    val v0 = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get
    runDml(root, name, ev)
    val mvDir = s"$root/../mv_replay"
    MvDmlMaintain.seed(spark, root, mvDir, grain, shapes, v0)
    MvDmlMaintain.catchUp(spark, root, mvDir, grain, shapes, v0)
    val before = mergedOf(mvDir)
    val committed = Snapshots.committedVersions(
      spark, DV.manifestTable(root))
    val (a, b) = (committed(committed.size - 2), committed.last)
    MvDmlMaintain.applyChanges(spark, root,
      DV.readChanges(spark, root, a, b), mvDir, grain, shapes)
    assert(mergedOf(mvDir) == before)
  }

  test("STAR summary (fact-delta JOIN dims via prepare): a grain " +
      "keyed by a DIM attribute stays exactly maintainable under the " +
      "mixed DML history — retraction resets re-derive THROUGH the " +
      "join") {
    val (root, name, ev) = freshTable()
    // a tiny static dimension: event_type -> weight bucket
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("w", (length(col("event_type")) % 3).cast("long"))
      .localCheckpoint()
    val prepare: DataFrame => DataFrame = f => f.join(dim, "event_type")
    val starGrain = Seq("w")
    val v0 = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get
    val mvDir = s"$root/../mv_star"
    MvDmlMaintain.seed(spark, root, mvDir, starGrain, shapes, v0,
      prepare)
    runDml(root, name, ev)
    MvDmlMaintain.catchUp(spark, root, mvDir, starGrain, shapes, v0,
      prepare)
    val got = MvDmlMaintain.merged(spark, mvDir, starGrain, shapes)
      .select(col("w"), col("s_v"), col("n"), col("mn"), col("mx"))
      .orderBy(col("w")).collect().toSeq
    val want = prepare(DV.read(spark, root)).groupBy(col("w"))
      .agg(sum(col("value").cast("decimal(28,4)")).as("s_v"),
        count(lit(1)).as("n"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .orderBy(col("w")).collect().toSeq
    assert(got == want,
      "the star summary must equal the base join-aggregate")
  }

  test("compaction bounds the store at O(grains) across a long DML " +
      "run — the merged answers are invariant, and a crash between " +
      "the fold write and the input deletes (leftover slices) " +
      "changes nothing") {
    val (root, name, ev) = freshTable()
    val v0 = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get
    val mvDir = s"$root/../mv_compact"
    MvDmlMaintain.seed(spark, root, mvDir, grain, shapes, v0)
    // a long alternating history: 12 DML commits, one batch each
    spark.conf.set("spark.graft.dv.cdf", "true")
    try {
      var prev = v0
      (1 to 6).foreach { i =>
        GraftSql.sql(spark,
          s"UPDATE $name SET value = value + $i " +
            s"WHERE event_id % ${7 + i} = 0").collect(): Unit
        GraftSql.sql(spark,
          s"DELETE FROM $name WHERE user_id % ${31 + i} = 0")
          .collect(): Unit
        MvDmlMaintain.catchUp(spark, root, mvDir, grain, shapes, prev)
        prev = Snapshots.latestVersion(
          spark, DV.manifestTable(root)).get
      }
    } finally spark.conf.unset("spark.graft.dv.cdf")
    def sliceCount: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) :+ f
        else Seq.empty
      walk(new java.io.File(mvDir))
        .count(_.getName.startsWith("slice="))
    }
    val before = mergedOf(mvDir)
    assert(before == baseAgg(root))
    // force a fold now regardless of threshold
    MvDmlMaintain.compact(spark, mvDir, grain, shapes,
      minSlices = 2): Unit
    assert(mergedOf(mvDir) == before, "compaction must not change " +
      "the served summary")
    assert(sliceCount <= 2 * MvDmlMaintain.NB,
      s"store must fold to O(buckets), got $sliceCount slice dirs")
    // crash simulation: re-run the SAME fold (idempotent overwrite of
    // its own slice) and also leave a stale duplicate input behind by
    // re-applying the last batch — merged stays exact through both
    val committed = Snapshots.committedVersions(
      spark, DV.manifestTable(root))
    MvDmlMaintain.applyChanges(spark, root,
      DV.readChanges(spark, root,
        committed(committed.size - 2), committed.last),
      mvDir, grain, shapes)
    MvDmlMaintain.compact(spark, mvDir, grain, shapes,
      minSlices = 2): Unit
    assert(mergedOf(mvDir) == before)
  }

  test("streaming face: the CDF-fed maintainer converges to the base " +
      "aggregate") {
    val (root, name, ev) = freshTable()
    val v0 = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get
    runDml(root, name, ev)
    val dir = Files.createTempDirectory("graft_mvdml_stream").toString
    val mvDir = s"$dir/mv"
    MvDmlMaintain.seed(spark, root, mvDir, grain, shapes, v0)
    val q = MvDmlMaintain.maintain(spark, root, s"$dir/ckpt", mvDir,
      grain, shapes, startingVersion = v0,
      trigger = Trigger.AvailableNow())
    try q.awaitTermination(120000) finally q.stop()
    assert(mergedOf(mvDir) == baseAgg(root))
  }
}
