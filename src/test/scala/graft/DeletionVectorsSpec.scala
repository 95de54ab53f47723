package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV, Snapshots}

/** Deletion vectors: O(deleted rows) delete with no data-file write,
  * structural idempotency, threshold purge behind an atomic manifest
  * flip, time travel across the purge, and vacuum GC of dead data
  * files + dead sidecar batches.
  */
class DeletionVectorsSpec extends SparkSpec {

  private def freshTable(): (String, DataFrame) = {
    val root = Files.createTempDirectory("graft_dv_spec").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    DV.init(spark, ev, root, "day")
    (root, ev)
  }

  private def dataFiles(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(DV.dataDir(root)))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toMap
  }

  test("delete touches no data file, masks exactly the victim rows, " +
      "and replays as a no-op") {
    val (root, ev) = freshTable()
    val before = dataFiles(root)
    val victims = ev.select("user_id").distinct()
      .filter(col("user_id") % 7 === 0)
    val expectKept = ev.filter(col("user_id") % 7 =!= 0).count()
    val expectDeleted = ev.count() - expectKept

    val marked = DV.delete(spark, root, "user_id", victims)
    assert(marked == expectDeleted)
    assert(dataFiles(root) == before,
      "a deletion-vector delete must not touch data files")
    assert(DV.read(spark, root).count() == expectKept)
    assert(DV.read(spark, root)
      .filter(col("user_id") % 7 === 0).count() == 0)

    // structural idempotency: deleted rows are invisible to the
    // marking scan, so the replay appends zero tombstones
    assert(DV.delete(spark, root, "user_id", victims) == 0)
    assert(DV.dv(spark, root).count() == expectDeleted)
  }

  test("blob compaction folds K delta blobs per file into one without " +
      "changing the mask, the threshold math, or open-ness to new deletes") {
    val (root, ev) = freshTable()
    // three SEPARATE delete batches -> up to three blobs per touched file
    for (r <- 0 to 2)
      DV.delete(spark, root, "user_id",
        ev.select("user_id").distinct().filter(col("user_id") % 11 === r))
    val tombBefore = DV.dv(spark, root).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    val keptBefore = DV.read(spark, root).count()
    // manifest paths, not java.io paths: blob dirs key on the
    // qualified form the manifest records
    val files = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0)).toSeq
    val countsBefore = files.map(f =>
      f -> graft.operators.DvBlobs.tombstoneCount(root, f)).toMap
    val maxBlobs = files.map(f =>
      graft.operators.DvBlobs.listDeltas(root, f).size).max
    assert(maxBlobs >= 2, "fixture must accumulate multiple blobs")

    val (dirs, inputs) = DV.compactBlobs(spark, root)
    assert(dirs > 0 && inputs > dirs,
      s"expected real folding, got dirs=$dirs inputs=$inputs")
    assert(files.forall(f =>
      graft.operators.DvBlobs.listDeltas(root, f).size <= 1))
    // the mask is the SAME position set, threshold math unchanged
    val tombAfter = DV.dv(spark, root).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(tombAfter == tombBefore)
    assert(DV.read(spark, root).count() == keptBefore)
    assert(files.map(f =>
      f -> graft.operators.DvBlobs.tombstoneCount(root, f)).toMap
      == countsBefore)

    // compaction is idempotent, and the dir stays open: a later
    // delete appends a fresh blob that the next compaction folds too
    assert(DV.compactBlobs(spark, root) == ((0L, 0L)))
    val marked = DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 11 === 3))
    assert(marked > 0)
    assert(DV.dv(spark, root).count() == tombBefore.size + marked)
    val (dirs2, _) = DV.compactBlobs(spark, root)
    assert(dirs2 > 0)
    assert(DV.read(spark, root).filter(col("user_id") % 11 <= 3).count()
      == 0)
  }

  test("multi-level partitioning: (day, region) layout inits, prunes " +
      "on either level, deletes, purges, and recovers its column " +
      "vector — single-level is just the depth-1 case") {
    val root = Files.createTempDirectory("graft_dv_ml").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("region", (col("user_id") % 3).cast("string"))
    DV.init(spark, ev, root, Seq("day", "region"))
    assert(DV.partitionColsOf(spark, root) == Seq("day", "region"))

    def rd = DV.read(spark, root)
    assert(rd.count() == ev.count())
    // prune on the INNER level alone, the outer alone, and both
    assert(rd.filter(col("region") === "1").count()
      == ev.filter(col("region") === "1").count())
    val day = ev.select("day").orderBy("day").first().getString(0)
    assert(rd.filter(col("day") === day).count()
      == ev.filter(col("day") === day).count())
    assert(rd.filter(col("day") === day && col("region") === "2").count()
      == ev.filter(col("day") === day && col("region") === "2").count())
    // the inner-level prune really prunes: listed files shrink
    val pruned = rd.filter(col("region") === "0")
      .select(col("_metadata.file_path")).distinct().count()
    val total = rd.select(col("_metadata.file_path")).distinct().count()
    assert(pruned < total, "region filter pruned no files")

    // delete + threshold purge over the 2-level layout
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 4 === 0))
    val kept = ev.filter(col("user_id") % 4 =!= 0)
    assert(rd.count() == kept.count())
    val hot = DV.purge(spark, root, Seq("day", "region"), 0.0, () => ())
    assert(hot.nonEmpty)
    assert(rd.count() == kept.count())
    assert(DV.partitionColsOf(spark, root) == Seq("day", "region"),
      "purge replacements lost the partition vector")
    assert(rd.filter(col("region") === "1").count()
      == kept.filter(col("region") === "1").count())

    // vacuum recurses the 2-level hive layout: every file the purge
    // replaced (now referenced by NO retained manifest) is reclaimed
    // from its day=/region= depth — a one-level walk would silently
    // orphan all of them — and the live set is untouched
    // crashed-writer debris: a dead DSv2 stage + its pending-blob
    // sibling (and a dead CDF stage) are swept by the same vacuum —
    // invisible to readers, but leaked bytes without the sweep
    val fsys = new java.io.File(root)
    Seq("_dml_stage_deadbeef", "_dml_stage_deadbeef_dvpending",
      "_cdf_stage_deadbeef").foreach { d =>
      val dir = new java.io.File(fsys, d)
      dir.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(dir, "junk.parquet").toPath, "x"): Unit
    }
    val (dataGone, dirsGone) = DV.vacuum(spark, root, keepVersions = 1,
      minAgeMs = 0L)
    assert(dataGone >= hot.size,
      s"vacuum reclaimed $dataGone files but the purge replaced " +
        s"${hot.size} at depth 2 — the walk missed the inner level")
    assert(rd.count() == kept.count(), "vacuum over-deleted live files")
    assert(dirsGone >= 3 && !new java.io.File(fsys,
        "_dml_stage_deadbeef").exists() &&
      !new java.io.File(fsys, "_dml_stage_deadbeef_dvpending").exists() &&
      !new java.io.File(fsys, "_cdf_stage_deadbeef").exists(),
      "stale write-stage debris must be swept")
    assert(new java.io.File(fsys, "_manifest").exists() &&
      new java.io.File(fsys, "data").exists(),
      "the sweep must never touch the log or the data dir")

    // writer face takes the comma list
    val root2 = Files.createTempDirectory("graft_dv_ml2").toString + "/t"
    ev.limit(500).write.format("graft-dv")
      .option("partitionCol", "day,region").save(root2)
    ev.limit(500).write.format("graft-dv").mode("append").save(root2)
    assert(DV.partitionColsOf(spark, root2) == Seq("day", "region"))
    assert(spark.read.format("graft-dv").load(root2).count() == 1000)
  }

  test("schema evolution: an append with a new column widens the " +
      "table atomically, old files null-fill, old versions time-travel " +
      "under their own schema, and retyping fails loudly") {
    val (root, ev) = freshTable()
    val v1 = Snapshots.latestVersion(spark, DV.manifestTable(root)).get
    val extra = ev.limit(50)
      .withColumn("event_id", col("event_id") + 9000000L)
      .withColumn("priority", (col("user_id") % 5).cast("int"))
    DV.append(spark, root, Seq("day"), extra)
    val v2 = Snapshots.latestVersion(spark, DV.manifestTable(root)).get

    val rd = DV.read(spark, root)
    assert(rd.columns.contains("priority"), "appended column missing")
    assert(rd.count() == ev.count() + 50)
    // old rows null-fill, new rows carry values
    assert(rd.filter(col("event_id") < 9000000L)
      .filter(col("priority").isNotNull).count() == 0)
    assert(rd.filter(col("event_id") >= 9000000L)
      .filter(col("priority").isNull).count() == 0)

    // time travel: v1 reads under the PRE-evolution schema
    val old = DV.readVersion(spark, root, v1)
    assert(!old.columns.contains("priority"),
      "old version must read under its own schema")
    assert(old.count() == ev.count())
    assert(DV.readVersion(spark, root, v2).columns.contains("priority"))

    // deletes + purge still work across the mixed-schema live set:
    // replacements materialize the null-filled column
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val hot = DV.purge(spark, root, Seq("day"), 0.0, () => ())
    assert(hot.nonEmpty)
    val after = DV.read(spark, root)
    assert(after.columns.contains("priority"))
    assert(after.count() ==
      ev.filter(col("user_id") % 3 =!= 0).count()
        + extra.filter(col("user_id") % 3 =!= 0).count())

    // retyping an existing column fails loudly, committing nothing
    val vBefore = Snapshots.latestVersion(spark, DV.manifestTable(root)).get
    val bad = ev.limit(5).withColumn("value", lit("oops"))
    val e = intercept[IllegalArgumentException] {
      DV.append(spark, root, Seq("day"), bad)
    }
    assert(e.getMessage.contains("incompatible schema change"))
    assert(Snapshots.latestVersion(spark, DV.manifestTable(root)).get
      == vBefore, "failed append must not commit a manifest")

    // an emptied table still knows its layout and schema from the
    // sentinel (partitionColsOf no longer needs live paths)
    assert(DV.partitionColsOf(spark, root) == Seq("day"))
  }

  test("manifest-borne min/max stats + lazy pruning: the driver " +
      "materializes only filter-surviving entries, range predicates " +
      "on the declared stats column prune files with NO skipping-index " +
      "sidecar, and the masked answer stays exact") {
    import org.apache.spark.sql.GraftDvApi
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, GreaterThanOrEqual, LessThanOrEqual, Literal}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.unsafe.types.UTF8String

    val root = Files.createTempDirectory("graft_dv_stats").toString
    // narrow per-file seq ranges: range-repartition before the
    // partitioned write, so min/max skipping has something to skip
    val df = spark.range(20000).select(
      (col("id") % 4).cast("string").as("day"),
      col("id").as("seq"),
      (col("id") * 2).as("payload"))
      .repartitionByRange(8, col("seq"))
      .sortWithinPartitions("seq")
    DV.init(spark, df, root, Seq("day"), statsCols = Seq("seq"))
    assert(!new java.io.File(DV.indexTable(root)).exists(),
      "this path must carry NO skipping-index sidecar")

    val rd = DV.read(spark, root)
    val idx = rd.queryExecution.analyzed.collectFirst {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation].location
    }.get.asInstanceOf[GraftDvApi.LazyManifestFileIndex]

    val total = idx.survivors(Nil, Nil).size
    assert(total > 8, s"fixture too small: $total files")

    // partition filter: the DRIVER materializes ~1/4 of the entries
    val dayAttr = AttributeReference("day",
      org.apache.spark.sql.types.StringType)()
    val oneDay = idx.survivors(Seq(EqualTo(dayAttr,
      Literal(UTF8String.fromString("2"),
        org.apache.spark.sql.types.StringType))), Nil)
    assert(oneDay.nonEmpty && oneDay.size <= total / 2,
      s"partition filter materialized ${oneDay.size}/$total entries")
    assert(oneDay.forall(_.partValues == Seq("2")))

    // stats range predicate: only files whose [min,max] overlaps
    val seqAttr = AttributeReference("seq", LongType)()
    val ranged = idx.survivors(Nil, Seq(
      GreaterThanOrEqual(seqAttr, Literal(5000L)),
      LessThanOrEqual(seqAttr, Literal(5999L)))).size
    assert(ranged < total / 2,
      s"stats predicate pruned nothing: $ranged/$total files")

    // a predicate on an UNDECLARED column must not prune
    val payAttr = AttributeReference("payload", LongType)()
    assert(idx.survivors(Nil,
      Seq(EqualTo(payAttr, Literal(10L)))).size == total)

    // end-to-end: the real query (filters travel through the scan)
    // returns exact answers, with the tombstone mask composing
    assert(rd.filter(col("seq").between(5000, 5999)).count() == 1000)
    DV.delete(spark, root, "seq",
      df.select("seq").filter(col("seq") % 2 === 0))
    assert(DV.read(spark, root)
      .filter(col("seq").between(5000, 5999)).count() == 500)
    assert(DV.read(spark, root).count() == 10000)
  }

  test("maintenance joins carry no forced broadcast: the whole " +
      "delete / refreshIndex / purge / vacuum cycle stays correct " +
      "with autoBroadcastJoinThreshold=-1 — the regime a 10M-file " +
      "live list forces, where every file-list join must take the " +
      "shuffle form") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (root, ev) = freshTable()
      DV.delete(spark, root, "user_id",
        ev.select("user_id").distinct().filter(col("user_id") % 4 === 0))
      val kept = ev.filter(col("user_id") % 4 =!= 0)
      val (_, _, fresh) = DV.refreshIndex(spark, root, "event_id")
      assert(fresh > 0)
      val hot = DV.purge(spark, root, Seq("day"), 0.0, () => ())
      assert(hot.nonEmpty)
      // refresh rides the rewritten manifest (kept rows carry over,
      // replacements index fresh) — both its file-list semi-joins
      // run in the no-broadcast regime here
      val (_, carriedN, freshN) = DV.refreshIndex(spark, root, "event_id")
      assert(carriedN + freshN > 0)
      DV.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
      assert(DV.read(spark, root).count() == kept.count())
      val keys = kept.select("event_id").orderBy("event_id").limit(3)
        .collect().map(_.getLong(0)).toSeq
      val (cands, total) = DV.indexLookup(spark, root, keys)
      assert(cands.size < total, "index skipped nothing post-purge")
      assert(DV.readFiles(spark, root, cands)
        .filter(col("event_id").isin(keys: _*)).count() == keys.size)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("read agrees with the plain filtered frame, column for column") {
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))
    val got = DV.read(spark, root)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").cast("decimal(28,4)").as("s"))
      .orderBy("event_type").collect()
    val want = ev.filter(col("user_id") % 5 =!= 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").cast("decimal(28,4)").as("s"))
      .orderBy("event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("purge rewrites only files past the threshold, read is " +
      "invariant, and time travel still resolves the pre-purge set") {
    val (root, ev) = freshTable()
    // victims clustered on one day -> that day's files cross the
    // threshold, the rest stay under it
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy("day").count().orderBy(desc("count"), asc("day"))
      .first().getString(0)
    val victims = ev
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .filter(col("user_id") % 2 === 0)
      .select("user_id").distinct()
    DV.delete(spark, root, "user_id", victims)

    val beforeRows = DV.read(spark, root)
      .orderBy("event_id").collect().toSeq
    val manifestBefore = DV.manifest(spark, root)
      .select("file").collect().map(_.getString(0)).toSet
    val vBefore = Snapshots.latestVersion(
      spark, DV.manifestTable(root)).get

    val hot = DV.purge(spark, root, "day", 0.3)
    assert(hot.nonEmpty, "expected at least one file past the threshold")
    assert(hot.forall(manifestBefore.contains))

    val manifestAfter = DV.manifest(spark, root)
      .select("file").collect().map(_.getString(0)).toSet
    assert(hot.forall(h => !manifestAfter.contains(h)),
      "purged files must leave the live set")
    assert((manifestBefore -- hot.toSet).subsetOf(manifestAfter),
      "files under the threshold must survive untouched")
    assert(DV.read(spark, root).orderBy("event_id").collect().toSeq
      == beforeRows, "purge must not change the visible table")

    // time travel: the pre-purge manifest still resolves and the old
    // files are still on disk until vacuum
    val old = DV.manifestAt(spark, root, vBefore)
    assert(old.select("file").collect().map(_.getString(0)).toSet
      == manifestBefore)
    assert(hot.forall(h =>
      new java.io.File(new java.net.URI(h).getPath).exists()))
  }

  test("a crash between staging and the manifest commit leaves the " +
      "visible table unchanged; the rerun repairs") {
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val beforeRows = DV.read(spark, root).count()

    // simulate the crash window: replacement files moved into the data
    // dirs but no manifest committed = orphan files on disk. Build the
    // same state by hand: copy one live file under a purged- name.
    val f = dataFiles(root).keys.head
    val src = java.nio.file.Paths.get(f)
    val dst = src.getParent.resolve("purged-deadbeef-9.parquet")
    java.nio.file.Files.copy(src, dst)

    assert(DV.read(spark, root).count() == beforeRows,
      "orphan replacement files must be invisible to readers")
    val hot = DV.purge(spark, root, "day", 0.2)
    assert(hot.nonEmpty)
    assert(DV.read(spark, root).count() == beforeRows,
      "rerun purge over the orphan state must still be invariant")
  }

  test("deleting every row, then purging at threshold 0, leaves an " +
      "empty but readable table; further deletes are no-ops") {
    val (root, ev) = freshTable()
    val everyone = ev.select("user_id").distinct()
    val marked = DV.delete(spark, root, "user_id", everyone)
    assert(marked == ev.count())
    assert(DV.read(spark, root).count() == 0)

    val hot = DV.purge(spark, root, "day", 0.0)
    assert(hot.nonEmpty, "every file is past a zero threshold")
    assert(DV.manifest(spark, root).count() == 0,
      "all-victim files must leave the manifest with no replacement")
    assert(DV.read(spark, root).count() == 0)
    assert(DV.read(spark, root).columns.contains("event_type"),
      "empty table must keep its schema")
    assert(DV.delete(spark, root, "user_id", everyone) == 0)
  }

  test("upsert: exactly one image per key, existing files untouched, " +
      "orphan appended files invisible until the manifest commit, " +
      "and purge composes over the mixed manifest") {
    val (root, ev) = freshTable()
    val before = dataFiles(root)

    val updates = ev.filter(col("event_id") % 4 === 0)
      .withColumn("value", col("value") * 2)
    val inserts = ev.filter(col("event_id") % 25 === 0)
      .withColumn("event_id", col("event_id") + lit(1000000000L))
    val (masked, newFiles) = DV.upsert(spark, root, "day", "event_id",
      updates.unionByName(inserts))
    assert(masked == updates.count(), "every updated key tombstoned once")
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(f => !before.contains(
      new java.net.URI(f).getPath)), "appends must be NEW files")
    assert(before.forall { case (p, len) =>
      new java.io.File(p).length() == len }, "existing files untouched")

    // exactly one image per key, new values served
    val got = DV.read(spark, root)
    assert(got.count() == ev.count() + inserts.count())
    assert(got.groupBy("event_id").count().filter(col("count") > 1)
      .count() == 0, "a key is doubled — old image leaked past its tombstone")
    val expect = ev.withColumn("value",
        when(col("event_id") % 4 === 0, col("value") * 2)
          .otherwise(col("value")))
      .unionByName(inserts)
    assert(got.agg(sum(col("value").cast("decimal(28,4)"))).head() ==
      expect.agg(sum(col("value").cast("decimal(28,4)"))).head())

    // an orphan appended file (crash before the manifest commit,
    // simulated by copying a new file under an uncommitted name)
    // must stay invisible
    val orphanSrc = java.nio.file.Paths.get(
      new java.net.URI(newFiles.head).getPath)
    java.nio.file.Files.copy(orphanSrc,
      orphanSrc.getParent.resolve("upsert-deadbeef-9.parquet"))
    assert(DV.read(spark, root).count() == ev.count() + inserts.count())

    // threshold purge over the mixed manifest keeps the answer
    val rows = DV.read(spark, root).orderBy("event_id").collect().toSeq
    DV.purge(spark, root, "day", 0.2)
    assert(DV.read(spark, root).orderBy("event_id").collect().toSeq == rows)
  }

  test("time travel semantics as documented: deletes are retroactive " +
      "(no resurrection at old versions); pre-upsert reads show " +
      "updated keys absent, not at old values") {
    val (root, ev) = freshTable()
    val v1 = Snapshots.latestVersion(spark, DV.manifestTable(root)).get

    // upsert advances the manifest; delete does not
    val updates = ev.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") * 2)
    DV.upsert(spark, root, "day", "event_id", updates)
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 7 === 0))

    // historical read = old manifest + CURRENT sidecar
    val v1Files = DV.manifestAt(spark, root, v1)
      .select("file").collect().map(_.getString(0)).toSeq
    val asOfV1 = DV.readFiles(spark, root, v1Files)

    assert(asOfV1.filter(col("user_id") % 7 === 0).count() == 0,
      "time travel resurrected an erased user")
    assert(asOfV1.filter(col("event_id") % 5 === 0).count() == 0,
      "pre-upsert read must show updated keys absent (documented), " +
        "not at their old values")
    // untouched rows still read historically
    assert(asOfV1.count() ==
      ev.filter(col("user_id") % 7 =!= 0)
        .filter(col("event_id") % 5 =!= 0).count())
  }

  test("skipping-index composition: a tombstoned needle is still " +
      "bloom-found but masked; a surviving needle comes back") {
    import graft.operators.SkippingIndex
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val idx = Files.createTempDirectory("graft_dv_keyidx").toString
    SkippingIndex.buildStats(spark, DV.rawScan(spark, root),
      idx, "event_id")

    val dead = ev.filter(col("user_id") % 3 === 0)
      .select("event_id").orderBy("event_id").first().getLong(0)
    val alive = ev.filter(col("user_id") % 3 =!= 0)
      .select("event_id").orderBy("event_id").first().getLong(0)

    val (cDead, _) = SkippingIndex.candidates(spark, idx, Seq(dead))
    assert(cDead.nonEmpty, "the index must still locate the dead row's file")
    assert(DV.readFiles(spark, root, cDead)
      .filter(col("event_id") === dead).count() == 0,
      "tombstoned needle leaked through the composition")

    val (cAlive, _) = SkippingIndex.candidates(spark, idx, Seq(alive))
    assert(DV.readFiles(spark, root, cAlive)
      .filter(col("event_id") === alive).count() ==
      ev.filter(col("event_id") === alive).count())
  }

  test("masked-read plan shape: the sidecar is never broadcast (the " +
      "round-9 scale ceiling), the mask is the codegen'd dv_alive " +
      "filter, and partition pruning is served from the MANIFEST") {
    import org.apache.spark.sql.GraftDvApi
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    import org.apache.spark.sql.types.StringType
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 5 === 0))

    val df = DV.read(spark, root)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "masked read must not broadcast tombstones — per-file delivery only")
    assert(!plan.contains("Join"),
      "masked read must be scan+filter, not a join against the sidecar")
    // `*(N)` prefixes mark whole-stage-codegen stages: the mask
    // filter must carry one (fused with the scan, not interpreted)
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Filter dv_alive.*"),
      s"mask not inside whole-stage codegen:\n$plan")
    assert(plan.contains("ManifestFileIndex"),
      "scan must be fed by the manifest file index, not a listing")
    // correct under that shape
    assert(df.count() == ev.filter(col("user_id") % 5 =!= 0).count())

    // partition pruning evaluated on manifest metadata, no FS listing:
    // a day-equality filter must shrink the listed file set
    val entries = DV.manifest(spark, root).select("file", "bytes")
      .collect().toSeq.map { r =>
        GraftDvApi.LiveFile(r.getString(0), r.getLong(1),
          GraftDvApi.parsePartitions(r.getString(0)).map(_._2))
      }
    val fi = new GraftDvApi.ManifestFileIndex(
      new org.apache.hadoop.fs.Path(DV.dataDir(root)), Seq("day"), entries)
    val total = fi.listFiles(Nil, Nil).map(_.files.size).sum
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .orderBy("d").first().getString(0)
    val attr = AttributeReference("day", StringType)()
    val pruned = fi.listFiles(
      Seq(EqualTo(attr, Literal.create(day, StringType))), Nil)
    assert(pruned.map(_.files.size).sum < total,
      "manifest-side partition pruning pruned nothing")
    assert(pruned.nonEmpty && pruned.map(_.files.size).sum > 0)
    // and the pruned file set is exactly that day's live files
    val dayFiles = entries.filter(_.partValues.contains(day)).map(_.path).toSet
    assert(pruned.flatMap(_.files.map(_.getPath.toString)).toSet == dayFiles)
  }

  test("skipping-index maintenance rides the manifest: a STALE lookup " +
      "after purge+upsert neither reads dead files nor misses moved/" +
      "new rows, and refresh re-indexes ONLY the files the index " +
      "never saw") {
    val (root, ev) = freshTable()
    val (_, _, built) = DV.refreshIndex(spark, root, "event_id")
    assert(built > 0)
    val prevIndexed = Snapshots.readLatest(spark, DV.indexTable(root))
      .select("file", "bloom").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap

    // clustered delete -> one day's files go hot (keyed by event_id,
    // which is day-local — a user_id victim set would mark rows on
    // EVERY day and make all files hot); purge replaces just those;
    // an upsert appends fresh files
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .groupBy("d").count().orderBy(desc("count"), asc("d"))
      .first().getString(0)
    DV.delete(spark, root, "event_id",
      ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day)
        .filter(col("event_id") % 2 === 0)
        .select("event_id").distinct())
    val hot = DV.purge(spark, root, "day", 0.3)
    assert(hot.nonEmpty)
    val inserts = ev.filter(col("event_id") % 25 === 0)
      .withColumn("event_id", col("event_id") + lit(1000000000L))
    DV.upsert(spark, root, "day", "event_id", inserts)
    val liveNow = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0)).toSet

    // STALE lookup (no refresh yet): a surviving needle from the
    // purged day now lives in a REPLACEMENT file the index never saw
    val moved = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .filter(col("event_id") % 2 =!= 0)
      .select("event_id").orderBy("event_id").first().getLong(0)
    assert(moved % 2 != 0)
    val (cMoved, totalLive) = DV.indexLookup(spark, root, Seq(moved))
    assert(cMoved.forall(liveNow.contains), "stale lookup read dead files")
    assert(DV.readFiles(spark, root, cMoved)
      .filter(col("event_id") === moved).count() ==
      ev.filter(col("event_id") === moved).count(),
      "stale lookup missed a row moved by the purge")
    // an INSERTED key (file added after the index build) is found too
    val insKey = inserts.select("event_id").orderBy("event_id")
      .first().getLong(0)
    val (cIns, _) = DV.indexLookup(spark, root, Seq(insKey))
    assert(DV.readFiles(spark, root, cIns)
      .filter(col("event_id") === insKey).count() == 1,
      "stale lookup missed a freshly inserted row")

    // refresh: carried rows byte-identical, only new files computed
    val (_, kept, added) = DV.refreshIndex(spark, root, "event_id")
    val expectedKept = prevIndexed.keySet.intersect(liveNow)
    val expectedNew = liveNow -- prevIndexed.keySet
    assert(kept == expectedKept.size.toLong)
    assert(added == expectedNew.size.toLong)
    assert(added < totalLive, "refresh rebuilt instead of incrementing")
    val after = Snapshots.readLatest(spark, DV.indexTable(root))
      .select("file", "bloom").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(after.keySet == liveNow, "refreshed index must cover the live set")
    expectedKept.foreach { f =>
      assert(java.util.Arrays.equals(after(f), prevIndexed(f)),
        s"carried index row for untouched file $f was recomputed differently")
    }

    // post-refresh: selective again and still correct
    val (c2, t2) = DV.indexLookup(spark, root, Seq(moved))
    assert(c2.length < t2, "refreshed index skipped nothing")
    assert(DV.readFiles(spark, root, c2)
      .filter(col("event_id") === moved).count() ==
      ev.filter(col("event_id") === moved).count())
  }

  test("partition values needing path-escaping round-trip through " +
      "init -> manifest-served pruning -> delete -> purge (the Erasure " +
      "escaping-bug class, pinned on the DV path)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dv_esc").toString
    // partition values with ':', ' ', '%', '=', and a numeric-looking
    // one — all must survive escapePathName/unescapePathName both ways
    val rows = Seq(
      (1L, "a:b", 10.0), (2L, "a:b", 20.0), (3L, "c d", 30.0),
      (4L, "p%q", 40.0), (5L, "e=f", 50.0), (6L, "0017", 60.0),
      (7L, "a:b", 70.0), (8L, "c d", 80.0))
      .toDF("id", "part", "v")
    DV.init(spark, rows, root, "part")

    // pruning via the manifest: a partition filter must resolve the
    // UNESCAPED value
    val one = DV.read(spark, root).filter(col("part") === "a:b")
    assert(one.count() == 3)
    assert(DV.read(spark, root).filter(col("part") === "0017").count() == 1,
      "numeric-looking partition value mis-typed or mis-unescaped")
    assert(DV.read(spark, root).filter(col("part") === "e=f").count() == 1)

    // delete inside an escaped partition, then purge it at threshold 0
    DV.delete(spark, root, "id", Seq(1L, 3L).toDF("id"))
    assert(DV.read(spark, root).count() == 6)
    assert(DV.read(spark, root).filter(col("part") === "a:b").count() == 2)
    val replaced = DV.purge(spark, root, "part", 0.0)
    assert(replaced.nonEmpty)
    assert(DV.read(spark, root).count() == 6)
    assert(DV.read(spark, root).filter(col("part") === "c d")
      .agg(sum("v")).head().getDouble(0) == 80.0)
    // post-purge the moved files still parse their partition values
    assert(DV.partitionColsOf(spark, root) == Seq("part"))
  }

  test("vacuum deletes dead data files and dead per-file tombstone " +
      "dirs; the live table is untouched") {
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val hot = DV.purge(spark, root, "day", 0.2)
    assert(hot.nonEmpty)
    val rows = DV.read(spark, root).count()
    val dvDirsBefore = graft.operators.DvBlobs.allFileDirs(root)
    assert(dvDirsBefore.nonEmpty)
    val deadDirs = dvDirsBefore.count { d =>
      graft.operators.DvBlobs.dirDataFile(d)
        .forall(f => hot.contains(f))
    }

    val (dataGone, dvGone) =
      DV.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    assert(dataGone == hot.size.toLong,
      "exactly the purged files are unreferenced by the kept manifest")
    hot.foreach(h => assert(
      !new java.io.File(new java.net.URI(h).getPath).exists()))
    assert(DV.read(spark, root).count() == rows)

    // a blob dir is reclaimable iff its data file died with the purge
    assert(dvGone == deadDirs.toLong)
    val liveAfter = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0)).toSet
    graft.operators.DvBlobs.allFileDirs(root).foreach { d =>
      val owner = graft.operators.DvBlobs.dirDataFile(d)
      assert(owner.exists(liveAfter.contains),
        s"surviving blob dir $d references a dead file")
    }
  }

  test("vacuum's grace window shields a concurrent writer's moved-" +
      "but-uncommitted files: young unreferenced files survive, aged " +
      "ones are reclaimed") {
    val (root, ev) = freshTable()
    val day = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .orderBy("d").first().getString(0)
    // an in-flight upsert's moved-but-uncommitted file looks exactly
    // like this: real parquet, upsert-prefixed, in no manifest
    val f = dataFiles(root).keys.head
    val src = java.nio.file.Paths.get(f)
    val orphan = src.getParent.resolve("upsert-inflight-0.parquet")
    java.nio.file.Files.copy(src, orphan)
    val before = DV.read(spark, root).count()

    val (gone1, _) = DV.vacuum(spark, root, keepVersions = 1)
    assert(gone1 == 0L, "grace window must shield young orphans")
    assert(java.nio.file.Files.exists(orphan))

    // age the orphan past the window -> reclaimable
    orphan.toFile.setLastModified(
      System.currentTimeMillis() - DV.DefaultVacuumGraceMs - 60000L)
    val (gone2, _) = DV.vacuum(spark, root, keepVersions = 1)
    assert(gone2 == 1L && !java.nio.file.Files.exists(orphan))
    assert(DV.read(spark, root).count() == before)
    val _ = day
  }

  test("upsert refuses a batch carrying two images of one key; " +
      "latestBy resolves it to the newest image; a latestBy tie " +
      "still fails loudly") {
    val (root, ev) = freshTable()
    val one = ev.orderBy("event_id").limit(1)
    val doubled = one.withColumn("value", col("value") * 2)
      .withColumn("seq", lit(1L))
      .unionByName(one.withColumn("value", col("value") * 3)
        .withColumn("seq", lit(2L)))

    intercept[IllegalArgumentException] {
      DV.upsert(spark, root, "day", "event_id", doubled.drop("seq"))
    }

    // latestBy picks seq=2 (value*3)
    val key = one.select("event_id").first().getLong(0)
    val (masked, files) = DV.upsert(spark, root, "day", "event_id",
      doubled, latestBy = Some("seq"))
    assert(masked == ev.filter(col("event_id") === key).count())
    assert(files.nonEmpty)
    val got = DV.read(spark, root).filter(col("event_id") === key)
    assert(got.count() == 1)
    assert(got.select((col("value") ===
      one.select(col("value") * 3).first().getDouble(0)).as("ok"))
      .first().getBoolean(0))

    // tie on (key, latestBy): no deterministic winner exists
    val tied = one.withColumn("value", col("value") * 5)
      .withColumn("seq", lit(9L))
      .unionByName(one.withColumn("value", col("value") * 7)
        .withColumn("seq", lit(9L)))
    intercept[IllegalArgumentException] {
      DV.upsert(spark, root, "day", "event_id", tied,
        latestBy = Some("seq"))
    }
  }

  test("a delete racing a purge is never lost: the delete fences on " +
      "the maintenance claim and re-marks its victims in the " +
      "replacement files before returning") {
    val (root, ev) = freshTable()
    // make every file hot so the purge rewrites everything
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))

    // racing delete, started while the purge holds the claim: its
    // deltas land against files the purge is mid-replacing
    val raceVictims = ev.select("user_id").distinct()
      .filter(col("user_id") % 3 === 1)
    @volatile var raceMarked = -1L
    @volatile var raceErr: Throwable = null
    val racer = new Thread(() => {
      try raceMarked = DV.delete(spark, root, "user_id", raceVictims)
      catch { case t: Throwable => raceErr = t }
    })

    val hot = DV.purge(spark, root, "day", 0.2, onBeforeCommit = () => {
      // the purge has staged + moved; now the racing delete begins —
      // its deltas reference files this purge is about to retire
      racer.start()
      // let the racer write its (doomed) deltas and reach the fence
      Thread.sleep(1500)
    })
    assert(hot.nonEmpty)
    racer.join(120000)
    assert(raceErr == null, s"racing delete failed: $raceErr")
    assert(raceMarked > 0L)

    // the raced victims must be gone from the POST-purge table — the
    // round-9 design left them resurrected in the replacement files
    val got = DV.read(spark, root)
    assert(got.filter(col("user_id") % 3 === 0).count() == 0)
    assert(got.filter(col("user_id") % 3 === 1).count() == 0,
      "raced delete lost: victims resurrected in replacement files")
    assert(got.count() == ev.filter(col("user_id") % 3 === 2).count())
  }

  test("an upsert committing mid-purge makes the purge REBASE its " +
      "manifest math instead of stomping the upsert's files") {
    val (root, ev) = freshTable()
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 3 === 0))
    val inserts = ev.filter(col("event_id") % 25 === 0)
      .withColumn("event_id", col("event_id") + lit(1000000000L))
      .withColumn("user_id", col("user_id") + lit(10000000L))

    @volatile var upsertErr: Throwable = null
    val hot = DV.purge(spark, root, "day", 0.2, onBeforeCommit = () => {
      // the purge staged+moved; an upsert now commits FIRST — the
      // purge's CAS must fail once and rebase onto the new manifest
      try { DV.upsert(spark, root, "day", "event_id", inserts): Unit }
      catch { case t: Throwable => upsertErr = t }
    })
    assert(hot.nonEmpty)
    assert(upsertErr == null, s"mid-purge upsert failed: $upsertErr")

    val got = DV.read(spark, root)
    val expect = ev.filter(col("user_id") % 3 =!= 0).unionByName(inserts)
    assert(got.count() == expect.count(),
      "purge rebase lost the concurrent upsert's files (or doubled rows)")
    assert(got.agg(sum(col("value").cast("decimal(28,4)"))).head() ==
      expect.agg(sum(col("value").cast("decimal(28,4)"))).head())
  }
}
