package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV}

/** Row tracking: stable row ids that survive every content-preserving
  * rewrite. Enable assigns ids retroactively (file-order base +
  * position); appends take fresh ranges off the watermark; purge /
  * pack / zorder / migrate MATERIALIZE surviving rows' ids into their
  * replacements — so the (event_id → row_id) map is invariant across
  * the whole maintenance lifecycle, ids are unique, and deleted ids
  * are never reused.
  */
class RowTrackingSpec extends SparkSpec {

  private def fresh(): (String, DataFrame) = {
    val root = Files.createTempDirectory("graft_rowtrack").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    DV.init(spark, ev, root, "day")
    (root, ev)
  }

  private def idMap(root: String): Map[Long, Long] =
    DV.readWithRowId(spark, root)
      .select(col("event_id"), col("__row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("enable assigns unique retroactive ids; the map is stable " +
      "across delete, purge, pack, zorder and partition migration; " +
      "appends mint fresh ids above the watermark") {
    val (root, ev) = fresh()
    DV.enableRowTracking(spark, root): Unit
    intercept[IllegalArgumentException](DV.enableRowTracking(spark, root))
    val ids0 = idMap(root)
    assert(ids0.size == 300)
    assert(ids0.values.toSeq.distinct.size == 300, "ids must be unique")
    assert(ids0.values.forall(id => id >= 0 && id < 300),
      "retroactive ids fill the watermark range exactly")

    // delete a stripe: survivors keep their EXACT ids
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))
    val afterDel = idMap(root)
    assert(afterDel.forall { case (k, id) => ids0(k) == id })
    val deletedIds = ids0.keySet -- afterDel.keySet

    // purge rewrites hot files — materialized ids must carry
    DV.purge(spark, root, "day", 0.0): Unit
    assert(idMap(root) == afterDel, "purge must preserve row ids")

    // append: fresh ids, strictly above everything ever assigned
    DV.append(spark, root, Seq("day"),
      ev.limit(40).withColumn("event_id", col("event_id") + 900000L))
    val afterApp = idMap(root)
    assert(afterApp.size == afterDel.size + 40)
    val freshIds = afterApp.filter(_._1 >= 900000L).values.toSet
    assert(freshIds.forall(_ >= 300),
      "appended rows must mint ids off the watermark")
    assert((freshIds & ids0.values.toSet).isEmpty &&
      (freshIds & deletedIds.map(ids0).toSet).isEmpty,
      "deleted ids are never reused")
    assert(afterApp.values.toSeq.distinct.size == afterApp.size)

    // pack + zorder: layout rewrites, ids invariant
    DV.compactSmallFiles(spark, root): Unit
    assert(idMap(root) == afterApp, "pack must preserve row ids")
    DV.zorder(spark, root, Seq("user_id")): Unit
    assert(idMap(root) == afterApp, "zorder must preserve row ids")

    // partition evolution + full migration: ids invariant across the
    // generation rewrite too
    DV.setPartitioning(spark, root, Seq("event_type"))
    DV.migrateLayout(spark, root, None): Unit
    assert(idMap(root) == afterApp, "migration must preserve row ids")

    // content face untouched: plain read equals the id-read minus id
    assert(DV.read(spark, root).count() == afterApp.size)
    assert(!DV.read(spark, root).columns.contains("__row_id"),
      "plain reads must not see the physical id column")
  }

  test("mixed partition generations: ids stay stable through " +
      "partition evolution, a SCOPED migration (mixed-layout reads), " +
      "and the remaining old-generation files — the per-layout scan " +
      "carries the materialized id column in every generation") {
    val (root, ev) = fresh()
    DV.enableRowTracking(spark, root): Unit
    val ids0 = idMap(root)
    DV.setPartitioning(spark, root, Seq("event_type"))
    assert(idMap(root) == ids0, "the metadata flip changes no id")
    // scoped migration rewrites only matching old-generation files —
    // the table then serves MIXED generations, some rewritten
    // (materialized ids), some original (base + pos)
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))
    DV.migrateLayout(spark, root,
      Some(s"day >= '${days(days.length / 2)}'")): Unit
    assert(idMap(root) == ids0,
      "a scoped migration must preserve every id across BOTH " +
        "generations")
    // an append into the NEW layout mints fresh ids alongside
    DV.append(spark, root, Seq("event_type"),
      ev.limit(20).withColumn("event_id", col("event_id") + 800000L))
    val after = idMap(root)
    assert(after.filterKeys(_ < 800000L).toMap == ids0)
    assert(after.size == 320 &&
      after.values.toSeq.distinct.size == 320)
  }

  test("a keyed upsert mints FRESH ids for its images (delete+insert " +
      "identity, the Delta baseline) and the watermark only grows") {
    val (root, ev) = fresh()
    DV.enableRowTracking(spark, root): Unit
    val ids0 = idMap(root)
    DV.upsert(spark, root, "day", "event_id",
      ev.limit(25).withColumn("value", col("value") + 9)): Unit
    val after = idMap(root)
    assert(after.size == 300)
    val touched = ev.limit(25).select("event_id")
      .collect().map(_.getLong(0)).toSet
    touched.foreach { k =>
      assert(after(k) != ids0(k) && after(k) >= 300,
        s"upserted key $k must carry a fresh id") }
    (after.keySet -- touched).foreach { k =>
      assert(after(k) == ids0(k), s"untouched key $k must keep its id") }
    assert(after.values.toSeq.distinct.size == 300)
  }

  test("readWithRowId refuses on an untracked table; a stripped " +
      "reader refuses the feature-marked table") {
    val (root, _) = fresh()
    intercept[IllegalArgumentException](DV.readWithRowId(spark, root))
    DV.enableRowTracking(spark, root): Unit
    spark.conf.set("spark.graft.dv.readerFeatures",
      "column-mapping,partition-evolution,cdf-updates")
    try {
      val e = intercept[Exception](DV.read(spark, root).count())
      assert(e.getMessage.contains("row-tracking"))
    } finally spark.conf.unset("spark.graft.dv.readerFeatures")
  }
}
