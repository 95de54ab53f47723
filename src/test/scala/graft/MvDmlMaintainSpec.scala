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
