package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, DvBlobs}

/** Round-14 advisory regressions:
  *  - the skipping-index KEY column refuses RENAME/DROP (a flip would
  *    brick autoRefreshIndex on every subsequent write, and a
  *    same-name re-ADD would prune with the WRONG column's sidecar);
  *  - a marker naming a column outside the schema disables skipping
  *    instead of throwing from write paths, and a marker whose column
  *    resolves to a different PHYSICAL field than it was indexed
  *    under refuses to probe;
  *  - ANALYZE ... FOR COLUMNS under histogram.enabled survives
  *    all-null numeric columns (empty quantile endpoint arrays);
  *  - MERGE/INSERT-BY-NAME autoMerge widening is deferred from PARSE
  *    to EXECUTION (a parsed-but-never-run statement must not flip
  *    the manifest) and compares source/target names with the
  *    session resolver (case-insensitively by default);
  *  - a crashed delete-only DSv2 publish converges: the intent
  *    journal replays pending tombstone blobs to completion.
  */
class Round14AdviceSpec extends SparkSpec {

  private var seq = 0

  private def freshTable(): (String, DataFrame) = {
    seq += 1
    val root = Files.createTempDirectory(s"graft_r14_$seq").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(400)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    (root, ev)
  }

  test("RENAME/DROP of the skipping-index key column refuses loudly; " +
      "other columns stay eligible") {
    val (root, _) = freshTable()
    DV.refreshIndex(spark, root, "event_id"): Unit
    val r = intercept[IllegalArgumentException](
      DV.alterRenameColumn(spark, root, "event_id", "eid"))
    assert(r.getMessage.contains("skipping-index"))
    val d = intercept[IllegalArgumentException](
      DV.alterDropColumn(spark, root, "event_id"))
    assert(d.getMessage.contains("skipping-index"))
    // a non-key data column is unaffected by the guard
    DV.alterRenameColumn(spark, root, "event_type", "etype"): Unit
    assert(DV.read(spark, root).columns.contains("etype"))
  }

  test("a _keycol marker naming a column outside the schema disables " +
      "skipping (no throw from write-path auto refresh); a marker " +
      "whose physical pin mismatches refuses to probe but reads stay " +
      "exact") {
    val (root, ev) = freshTable()
    DV.refreshIndex(spark, root, "event_id"): Unit
    val marker = new java.io.File(s"${DV.indexTable(root)}/_keycol")
    def writeMarker(s: String): Unit = {
      val w = new java.io.FileOutputStream(marker)
      try w.write(s.getBytes("UTF-8")) finally w.close()
      // drop the Hadoop checksum twin the original create left behind
      // (raw overwrite would otherwise trip ChecksumException)
      new java.io.File(marker.getParent, s".${marker.getName}.crc")
        .delete(): Unit
    }
    // ghost column: autoRefreshIndex must not throw, just decline
    writeMarker("ghost_col")
    assert(!DV.autoRefreshIndex(spark, root))
    // existing column with a STALE physical pin: the hook must not
    // prune with the wrong column's sidecar — the full query is the
    // proof (exact answer means no file was wrongly skipped)
    writeMarker("user_id\nevent_id")
    val k = ev.select("user_id").head.getLong(0)
    val got = DV.read(spark, root)
      .filter(col("user_id") === k).count()
    val want = ev.filter(col("user_id") === k).count()
    assert(got == want && want > 0)
    // restore a valid marker: the normal path still works end to end
    writeMarker("event_id\nevent_id")
    val key = ev.select("event_id").head.getLong(0)
    assert(DV.read(spark, root)
      .filter(col("event_id") === key).count() ==
      ev.filter(col("event_id") === key).count())
  }

  test("ANALYZE FOR COLUMNS with histogram.enabled survives an " +
      "all-null numeric column and an empty table") {
    val root = Files.createTempDirectory("graft_r14_hist").toString
    val df = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(50)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("allnull", lit(null).cast("double"))
      .localCheckpoint()
    DV.init(spark, df, root, "day")
    val name = s"r14_hist_${math.abs(root.hashCode)}"
    spark.sql(
      s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    try {
      GraftSql.sql(spark,
        s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
        .collect(): Unit
      // the non-null numeric neighbours still got histograms — the
      // guard drops only the underivable column
      val stats = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst
          .TableIdentifier(name)).stats
      assert(stats.exists(_.colStats.get("value")
        .exists(_.histogram.isDefined)))
      assert(stats.exists(_.colStats.get("allnull")
        .exists(_.histogram.isEmpty)))
    } finally
      spark.conf.set("spark.sql.statistics.histogram.enabled", "false")
  }

  test("autoMerge widening happens at EXECUTION, not parse: a parsed " +
      "statement leaves the schema alone; running the wrapped command " +
      "widens and merges; case-only column differences never widen") {
    val (root, ev) = freshTable()
    spark.conf.set("spark.sql.catalog.graftdv",
      "graft.sources.GraftDvCatalog")
    val t = s"graftdv.`$root`"
    ev.limit(10)
      .withColumn("event_id", col("event_id") + 5000000L)
      .withColumn("score", lit(7).cast("int"))
      .createOrReplaceTempView("r14_evo_src")
    val mergeSql =
      s"""MERGE INTO $t tt USING r14_evo_src s
         |ON tt.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val parser = new graft.plans.GraftSqlParser(
      spark, spark.sessionState.sqlParser)
    spark.conf.set("spark.graft.dv.schema.autoMerge", "true")
    try {
      val p = parser.parsePlan(mergeSql)
      assert(p.isInstanceOf[graft.plans.DvWidenExecCommand],
        "a widening-eligible MERGE must wrap, not side-effect")
      assert(!DV.read(spark, root).columns.contains("score"),
        "PARSING the statement must not widen the table")
      // executing the wrapped command widens and merges
      org.apache.spark.sql.GraftPlanApi.ofRows(spark, p).collect(): Unit
      val rd = DV.read(spark, root)
      assert(rd.columns.contains("score"))
      assert(rd.filter(col("score") === 7).count() == 10)

      // case-only difference: the resolver matches VALUE to value, so
      // nothing is eligible to widen and the plan passes through raw
      ev.limit(5)
        .withColumn("event_id", col("event_id") + 9000000L)
        .withColumnRenamed("value", "VALUE")
        .createOrReplaceTempView("r14_case_src")
      val caseSql =
        s"""MERGE INTO $t tt USING r14_case_src s
           |ON tt.event_id = s.event_id
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin
      val p2 = parser.parsePlan(caseSql)
      assert(!p2.isInstanceOf[graft.plans.DvWidenExecCommand])
      assert(!DV.read(spark, root).columns
        .map(_.toLowerCase).count(_ == "value").>(1))
    } finally {
      spark.conf.unset("spark.graft.dv.schema.autoMerge")
      spark.conf.unset("spark.sql.catalog.graftdv")
    }
  }

  test("a crashed delete-only publish converges: the intent journal " +
      "replays pending tombstone blobs idempotently") {
    // r16 update (r15 ADVICE high): intents are journaled BEFORE the
    // first publish, so "crashed mid-publish" now means at least one
    // blob already landed — replay completes the REST. An intent with
    // zero published destinations is a failed statement and is
    // dropped unapplied (Round16AdviceSpec pins that leg).
    val (root, _) = freshTable()
    val before = DV.read(spark, root).count()
    val files = DV.manifest(spark, root)
      .select("file").collect().map(_.getString(0)).take(2)
    assert(files.length == 2)
    files.foreach(f => assert(spark.read.parquet(f).count() >= 3))
    // simulate a crash mid-publish: two pending blobs journaled, the
    // FIRST one's rename landed, then the process died
    val pendingRoot = s"$root/_dml_stage_r14crash_dvpending"
    val blobs = files.map(f =>
      DvBlobs.writeDelta(pendingRoot, f, Array(0L, 1L, 2L))).toSeq
    DvBlobs.writeIntent(root, blobs): Unit
    assert(DV.read(spark, root).count() == before,
      "pending tombstones must stay invisible")
    DvBlobs.publish(blobs.head, root): Unit
    assert(DV.read(spark, root).count() == before - 3,
      "the one published blob is live (partial state)")
    assert(DvBlobs.replayIntents(root) == 1)
    assert(DV.read(spark, root).count() == before - 6,
      "replay must complete the crashed delete")
    // idempotent: nothing left to replay, mask unchanged
    assert(DvBlobs.replayIntents(root) == 0)
    assert(DV.read(spark, root).count() == before - 6)
  }
}
