package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Erasure, TextOps}

/** File-level and completeness invariants of [[Erasure]] that the
  * `privacy_erasure` content gate can't see: which partitions were
  * physically rewritten, and the all-victim partition edge case where
  * dynamic overwrite alone would let deleted data survive.
  */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  private def listing(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath.stripPrefix(root) -> f.length()).toMap
  }

  test("erasure rewrites only victim-bearing days; victims fully purged") {
    val path = Files.createTempDirectory("graft_erasure_spec").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    val before = listing(path)
    val victims = ev.select(col("user_id")).distinct()
      .filter(TextOps.h60(
        concat(lit("erase_"), col("user_id").cast("string"))) % 11 === 0)
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    assert(victimIds.nonEmpty, "no victims at this SF — widen the list")
    val victimDays = ev.filter(col("user_id").isin(victimIds.toSeq: _*))
      .select("day").distinct().collect().map(_.getString(0)).toSet

    val affected = Erasure.erase(spark, path, "day", "user_id", victims)
    assert(affected.toSet == victimDays,
      s"affected $affected != days with victim rows $victimDays")

    val after = listing(path)
    val untouched = (m: Map[String, Long]) =>
      m.view.filterKeys(k => !victimDays.exists(v => k.startsWith(s"/day=$v/"))).toMap
    assert(untouched(before).nonEmpty,
      "victims cover every day — the stability assertion would be vacuous")
    assert(untouched(after) == untouched(before),
      "erasure rewrote days containing no victim rows")

    val table = spark.read.parquet(path)
    assert(table.filter(col("user_id").isin(victimIds.toSeq: _*)).count() == 0,
      "victim rows survived erasure")
    assert(table.count() ==
      ev.filter(!col("user_id").isin(victimIds.toSeq: _*)).count(),
      "non-victim rows lost in the rewrite")
  }

  test("a partition whose rows are all victims is removed, not skipped") {
    val path = Files.createTempDirectory("graft_erasure_empty").toString
    // partition A: only victim rows; partition B: mixed
    Seq((1L, "x", "A"), (1L, "y", "A"), (2L, "z", "B"), (1L, "w", "B"))
      .toDF("user_id", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    val victims = Seq(1L).toDF("user_id")
    val affected = Erasure.erase(spark, path, "part", "user_id", victims)
    assert(affected == Seq("A", "B"))
    assert(!new java.io.File(s"$path/part=A").exists(),
      "all-victim partition survived its own deletion")
    val rows = spark.read.parquet(path).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("user_id") == 2L)
  }

  test("escaped partition values: all-victim partition with specials is removed") {
    // Spark Hive-escapes ':' and '%' (and others) in partition dir
    // names; a string-built s"$path/$partCol=$v" misses them, so a
    // fully-victim partition would survive its own deletion. erase()
    // resolves directories by listing + decoding instead — pin it.
    val path = Files.createTempDirectory("graft_erasure_esc").toString
    val specialA = "2024-01-01 10:00"   // space + colon → '%3A' on disk
    val specialB = "50% off"            // '%' itself must round-trip
    Seq((1L, "x", specialA), (1L, "y", specialB), (2L, "z", specialB),
      (3L, "w", "plain"))
      .toDF("user_id", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    // precondition: the value really is escaped on disk
    val dirNames = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirNames.exists(_.contains("%3A")),
      s"expected an escaped ':' in $dirNames — escaping rules changed?")
    val affected = Erasure.erase(spark, path, "part", "user_id",
      Seq(1L).toDF("user_id"))
    assert(affected.toSet == Set(specialA, specialB))
    // the all-victim escaped partition is gone, physically
    val after = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(!after.exists(_.contains("10")),
      s"all-victim escaped partition survived: $after")
    val rows = spark.read.parquet(path)
      .select("user_id", "payload").collect().map(_.toSeq).toSet
    assert(rows == Set(Seq(2L, "z"), Seq(3L, "w")),
      s"wrong surviving rows: $rows")
  }

  test("numeric-looking partition values survive type re-rendering") {
    // partition inference would read part=01 back as int 1; erase()
    // disables inference so values round-trip as directory strings
    // and the directory match cannot miss.
    val path = Files.createTempDirectory("graft_erasure_num").toString
    Seq((1L, "a", "01"), (1L, "b", "02"), (2L, "c", "02"))
      .toDF("user_id", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    val affected = Erasure.erase(spark, path, "part", "user_id",
      Seq(1L).toDF("user_id"))
    assert(affected == Seq("01", "02"), s"got $affected")
    assert(!new java.io.File(s"$path/part=01").exists(),
      "all-victim part=01 survived (value re-rendered as 1?)")
    val rows = spark.read.parquet(path).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("user_id") == 2L)
  }

  test("kill between stage and overwrite: sink untouched, rerun repairs") {
    val path = Files.createTempDirectory("graft_erasure_kill").toString
    Seq((1L, "x", "A"), (2L, "y", "A"), (3L, "z", "B"))
      .toDF("user_id", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    val before = listing(path)
    val boom = intercept[RuntimeException] {
      Erasure.erase(spark, path, "part", "user_id",
        Seq(1L).toDF("user_id"),
        beforeOverwrite = () => throw new RuntimeException("kill -9"))
    }
    assert(boom.getMessage == "kill -9")
    assert(listing(path) == before,
      "a kill after staging but before the overwrite damaged the sink")
    // rerun with no failpoint: repairs cleanly
    val affected = Erasure.erase(spark, path, "part", "user_id",
      Seq(1L).toDF("user_id"))
    assert(affected == Seq("A"))
    val rows = spark.read.parquet(path)
      .select("user_id").as[Long].collect().toSet
    assert(rows == Set(2L, 3L))
  }

  test("overwrite does not read the directories it replaces") {
    // the staged (localCheckpointed) kept-frame must be the ONLY
    // input to the rewrite: delete the affected source directories in
    // the stage→overwrite window and the rewrite must still land the
    // correct rows. This is the literal claim behind the crash-window
    // fix — if the overwrite job still scanned the sink, this test
    // would throw FileNotFound or lose rows.
    val path = Files.createTempDirectory("graft_erasure_noread").toString
    Seq((1L, "x", "A"), (2L, "y", "A"), (3L, "z", "B"))
      .toDF("user_id", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    val affected = Erasure.erase(spark, path, "part", "user_id",
      Seq(1L).toDF("user_id"),
      beforeOverwrite = () => {
        val dir = new java.io.File(s"$path/part=A")
        assert(dir.exists())
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(dir)
      })
    assert(affected == Seq("A"))
    val rows = spark.read.parquet(path)
      .select("user_id").as[Long].collect().toSet
    assert(rows == Set(2L, 3L), s"rewrite lost or resurrected rows: $rows")
  }

  test("erasing with an empty deletion list touches nothing") {
    val path = Files.createTempDirectory("graft_erasure_noop").toString
    Seq((1L, "x", "A")).toDF("user_id", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    val before = listing(path)
    val affected = Erasure.erase(spark, path, "part", "user_id",
      Seq.empty[Long].toDF("user_id"))
    assert(affected.isEmpty && listing(path) == before)
  }

  test("erasure under versioned snapshots: vacuum makes forgetting total") {
    // time travel and the right to be forgotten CONFLICT by design:
    // publishing an erased table as a new version leaves the victim
    // rows servable through every retained older version. The
    // resolution is retention policy — vacuum down to the erased
    // version. This pins all three phases: the conflict exists, vacuum
    // resolves it, history above the erased version is really gone.
    import graft.operators.Snapshots
    val table = Files.createTempDirectory("graft_erasure_snap").toString
    val rows = Seq((1L, "secret"), (2L, "keep"), (3L, "keep2"))
      .toDF("user_id", "payload")
    val v1 = Snapshots.publish(spark, table, rows)
    val v2 = Snapshots.publish(spark, table,
      rows.filter(col("user_id") =!= 1L))
    // phase 1: the conflict — v1 still serves the victim
    assert(Snapshots.readVersion(spark, table, v1)
      .filter(col("user_id") === 1L).count() == 1)
    // phase 2: retention enforcement
    Snapshots.vacuum(spark, table, keep = 1)
    assert(Snapshots.committedVersions(spark, table) == Seq(v2))
    // phase 3: no readable version anywhere serves the victim
    assert(Snapshots.readLatest(spark, table)
      .filter(col("user_id") === 1L).count() == 0)
    intercept[Exception] { Snapshots.readVersion(spark, table, v1).count() }
  }
}
