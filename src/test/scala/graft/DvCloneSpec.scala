package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, Snapshots}

/** SHALLOW CLONE ([[graft.operators.DeletionVectors.shallowClone]] +
  * the `CREATE TABLE ... SHALLOW CLONE ... LOCATION` statement):
  * zero-copy table creation, retroactive-mask inheritance, divergence,
  * and the maintenance-isolation contracts.
  */
class DvCloneSpec extends SparkSpec {

  private var seq = 0

  private def freshSource(): (String, org.apache.spark.sql.DataFrame) = {
    seq += 1
    val root = Files.createTempDirectory("graft_dvclone_src").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    (root, ev)
  }

  private def dstDir(): String = {
    val d = Files.createTempDirectory("graft_dvclone_dst").toString
    // shallowClone refuses an existing TABLE; an existing empty dir is
    // fine, but keep the refusal path testable with a fresh name
    new java.io.File(d).delete()
    d
  }

  test("clone serves the source's committed state — including the " +
      "retroactive mask — with zero data bytes under its root") {
    val (src, ev) = freshSource()
    DV.delete(spark, src, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 4 === 0))
    val kept = ev.filter(col("user_id") % 4 =!= 0)
    val dst = dstDir()
    assert(DV.shallowClone(spark, src, dst) == 1L)
    assert(DV.read(spark, dst).count() == kept.count())
    assert(DV.read(spark, dst).agg(sum("event_id")).head().getLong(0) ==
      kept.agg(sum("event_id")).head().getLong(0))
    // zero data bytes under the clone's data dir
    val dataFiles = new java.io.File(s"$dst/data").listFiles()
    assert(dataFiles == null || dataFiles.isEmpty)
    // history starts at v1 with the clone verb
    val h = DV.history(spark, dst).collect()
    assert(h.length == 1 && h.head.getString(2) == "clone")
    // cloning onto an existing table refuses
    intercept[IllegalArgumentException](DV.shallowClone(spark, src, dst))
  }

  test("clone and source diverge freely: deletes, appends, and purge " +
      "rewrites stay on their own side") {
    val (src, ev) = freshSource()
    val dst = dstDir()
    DV.shallowClone(spark, src, dst): Unit

    // delete on the clone only
    DV.delete(spark, dst, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    assert(DV.read(spark, src).count() == 300)
    assert(DV.read(spark, dst).count() ==
      ev.filter(col("user_id") % 3 =!= 0).count())

    // append on the source only
    DV.append(spark, src, Seq("day"), ev.limit(20)
      .withColumn("event_id", col("event_id") + 4000000L))
    assert(DV.read(spark, src).count() == 320)
    assert(DV.read(spark, dst).count() ==
      ev.filter(col("user_id") % 3 =!= 0).count())

    // purge on the clone rewrites its hot (shared) files under the
    // CLONE's root and drops the source references from its manifest
    val rewritten = DV.purge(spark, dst, "day", 0.0)
    assert(rewritten.nonEmpty)
    val liveAfter = DV.manifest(spark, dst).select("file")
      .collect().map(_.getString(0))
    val dstPrefix = org.apache.spark.sql.GraftDvApi.urlOf(
      new org.apache.hadoop.fs.Path(dst).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .makeQualified(new org.apache.hadoop.fs.Path(dst)))
    assert(liveAfter.forall(_.startsWith(dstPrefix)),
      s"purge left source references: ${liveAfter.filterNot(
        _.startsWith(dstPrefix)).take(2).mkString(", ")}")
    assert(DV.read(spark, dst).count() ==
      ev.filter(col("user_id") % 3 =!= 0).count())
    // and the SOURCE's read is untouched by the clone's purge
    assert(DV.read(spark, src).count() == 320)
  }

  test("clone vacuum never reclaims source files; VERSION AS OF " +
      "clones an older state; SQL face registers the catalog name") {
    val (src, ev) = freshSource()
    DV.append(spark, src, Seq("day"), ev.limit(30)
      .withColumn("event_id", col("event_id") + 6000000L))

    // SQL: clone v1 (pre-append) under a catalog name
    seq += 1
    val srcTbl = s"dvclone_src_t$seq"
    spark.sql(s"CREATE TABLE $srcTbl USING `graft-dv` " +
      s"OPTIONS (path '$src')")
    val dst = dstDir()
    val dstTbl = s"dvclone_dst_t$seq"
    val out = graft.GraftSql.sql(spark, s"CREATE TABLE $dstTbl SHALLOW " +
      s"CLONE $srcTbl VERSION AS OF 1 LOCATION '$dst'").collect()
    assert(out.head.getLong(0) == 1L)
    assert(spark.table(dstTbl).count() == 300)

    // vacuum the CLONE aggressively: the source's files are never its
    // sweep's candidates, so both tables keep reading
    DV.vacuum(spark, dst, keepVersions = 1, minAgeMs = 0L)
    assert(spark.table(dstTbl).count() == 300)
    assert(DV.read(spark, src).count() == 330)

    // the hazard direction is the documented contract: vacuuming the
    // SOURCE while the clone still shares files breaks the clone — so
    // un-share first. Prove the safe order END TO END: rewrite EVERY
    // live clone file under its own root (zorder is the unconditional
    // full rewrite; purge would skip tombstone-free shared files),
    // then kill and RECLAIM the shared originals on the source side;
    // the clone must keep reading because it references none of them.
    DV.delete(spark, dst, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 2 === 0))
    DV.zorder(spark, dst, Seq("user_id")): Unit
    DV.delete(spark, src, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))
    DV.purge(spark, src, "day", 0.0): Unit
    DV.vacuum(spark, src, keepVersions = 1, minAgeMs = 0L)
    assert(spark.table(dstTbl).count() ==
      ev.filter(col("user_id") % 2 =!= 0).count())
    val srcExpected = ev.filter(col("user_id") % 5 =!= 0).count() +
      ev.limit(30).filter(col("user_id") % 5 =!= 0).count()
    assert(DV.read(spark, src).count() == srcExpected)

    // non-dv source fails loudly through the SQL face
    intercept[Exception](graft.GraftSql.sql(spark,
      s"CREATE TABLE x SHALLOW CLONE no_such_tbl LOCATION '/tmp/x'")
      .collect())
  }
}
