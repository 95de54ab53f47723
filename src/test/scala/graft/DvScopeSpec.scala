package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV}

/** Bounded maintenance: `OPTIMIZE t WHERE <partition predicate>`
  * scopes the rewrite sweeps (purge, bin-pack, zorder) to matching
  * partitions — at 100 TB you maintain yesterday's partition, not the
  * table — and `DESCRIBE HISTORY ... LIMIT n` bounds the log SCAN to
  * the last n+1 version dirs, not just the output rows.
  */
class DvScopeSpec extends SparkSpec {

  private def trickle(batches: Int): (String, String,
      org.apache.spark.sql.DataFrame) = {
    val root = Files.createTempDirectory("graft_dvscope").toString
    val name = s"dvscope_t_${math.abs(root.hashCode)}"
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(240)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    def slice(b: Int) = ev.filter(pmod(col("event_id"),
      lit(batches.toLong)) === b)
    DV.init(spark, slice(0), root, "day")
    for (b <- 1 until batches)
      DV.append(spark, root, Seq("day"), slice(b))
    spark.sql(s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    (root, name, ev)
  }

  private def perDir(root: String): Map[String, Int] =
    DV.manifest(spark, root).select("file").collect()
      .map(_.getString(0))
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
      .map { case (d, fs) => d -> fs.length }

  test("OPTIMIZE ... WHERE packs ONLY the matching partitions; " +
      "range predicates scope lexicographically; out-of-scope dirs " +
      "keep their exact file sets") {
    val (root, name, ev) = trickle(6)
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))
    val d0 = days.head
    val before = DV.manifest(spark, root).select("file").collect()
      .map(_.getString(0)).toSet

    val out = graft.GraftSql.sql(spark,
      s"OPTIMIZE $name WHERE day = '$d0'").head()
    assert(out.getLong(3) > 0, "the scoped day's slivers must pack")
    val after = perDir(root)
    assert(after.filterKeys(_.contains(s"day=$d0")).values.forall(_ == 1))
    // every OTHER dir's file set is byte-for-byte the one from before
    val untouched = DV.manifest(spark, root).select("file").collect()
      .map(_.getString(0)).filterNot(_.contains(s"day=$d0")).toSet
    assert(untouched == before.filterNot(_.contains(s"day=$d0")),
      "out-of-scope partitions must not be rewritten")
    assert(spark.table(name).count() == 240)

    // a RANGE scope covers the upper half of the days
    val mid = days(days.length / 2)
    graft.GraftSql.sql(spark,
      s"OPTIMIZE $name WHERE day >= '$mid'").collect()
    val afterRange = perDir(root)
    days.filter(_ >= mid).foreach { d =>
      assert(afterRange.filterKeys(_.contains(s"day=$d")).values
        .forall(_ == 1), s"day $d inside the range scope must be packed")
    }
    assert(spark.table(name).count() == 240)

    // predicates over non-partition columns fail in analysis — loudly
    intercept[Exception](graft.GraftSql.sql(spark,
      s"OPTIMIZE $name WHERE user_id > 5").collect())
  }

  test("scoped ZORDER rewrites only the matching partition's files") {
    val root = Files.createTempDirectory("graft_dvscopez").toString
    val name = s"dvscopez_t_${math.abs(root.hashCode)}"
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(300).localCheckpoint()
    DV.init(spark, ev.repartition(6), root, Seq("event_type"),
      statsCols = Seq("user_id"))
    spark.sql(s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    val types = ev.select("event_type").distinct().orderBy("event_type")
      .collect().map(_.getString(0))
    val t0 = types.head
    val before = DV.manifest(spark, root).select("file").collect()
      .map(_.getString(0)).toSet

    val out = graft.GraftSql.sql(spark, s"OPTIMIZE $name WHERE " +
      s"event_type = '$t0' ZORDER BY (user_id)").head()
    assert(out.getLong(2) > 0)
    val untouched = DV.manifest(spark, root).select("file").collect()
      .map(_.getString(0)).filterNot(_.contains(s"event_type=$t0")).toSet
    assert(untouched == before.filterNot(_.contains(s"event_type=$t0")))
    assert(spark.table(name).count() == 300)
    assert(DV.history(spark, root).orderBy(desc("version"))
      .select("operation").head().getString(0) == "zorder")
  }

  test("INCREMENTAL ZORDER clusters only files added since the last " +
      "zorder: previously-clustered files stay byte-identical, a " +
      "second pass is a no-op, mismatched clustering columns refuse, " +
      "and INCREMENTAL without ZORDER is an error") {
    val root = Files.createTempDirectory("graft_dvincz").toString
    val name = s"dvincz_t_${math.abs(root.hashCode)}"
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(400).localCheckpoint()
    DV.init(spark, ev.limit(300).repartition(6), root,
      Seq("event_type"), statsCols = Seq("user_id"))
    spark.sql(s"CREATE TABLE $name USING `graft-dv` OPTIONS (path '$root')")
    graft.GraftSql.sql(spark,
      s"OPTIMIZE $name ZORDER BY (user_id)").head(): Unit
    def liveSet: Set[String] = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0)).toSet
    def fp(fs: Set[String]): Map[String, (Long, Long)] = fs.map { u =>
      val f = new java.io.File(new java.net.URI(
        java.net.URLDecoder.decode(u, "UTF-8")).getPath)
      u -> (f.length(), f.lastModified())
    }.toMap
    val clustered = liveSet
    val clusteredFp = fp(clustered)
    // a CDC-style sliver lands after the zorder
    DV.append(spark, root, Seq("event_type"),
      ev.filter(col("event_id") % 4 === 1).limit(60)
        .withColumn("event_id", col("event_id") + 900000L)): Unit
    val added = liveSet -- clustered
    assert(added.nonEmpty)
    val out = graft.GraftSql.sql(spark,
      s"OPTIMIZE $name INCREMENTAL ZORDER BY (user_id)").head()
    assert(out.getLong(2) == added.size,
      s"incremental must rewrite exactly the ${added.size} new files, " +
        s"got ${out.getLong(2)}")
    // every previously-clustered file survives byte-identical
    assert(clustered.subsetOf(liveSet),
      "incremental must not replace previously-clustered files")
    assert(fp(clustered) == clusteredFp,
      "previously-clustered files must stay byte-identical")
    assert(spark.table(name).count() == 360)
    // second pass: nothing new, nothing rewritten
    assert(graft.GraftSql.sql(spark,
      s"OPTIMIZE $name INCREMENTAL ZORDER BY (user_id)")
      .head().getLong(2) == 0)
    // pinned-columns refusal and the keyword contract
    val e = intercept[Exception](graft.GraftSql.sql(spark,
      s"OPTIMIZE $name INCREMENTAL ZORDER BY (value)").collect())
    assert(e.getMessage.contains("pinned clustering columns"))
    intercept[Exception](graft.GraftSql.sql(spark,
      s"OPTIMIZE $name INCREMENTAL").collect())
  }

  test("DESCRIBE HISTORY LIMIT n returns the last n versions with " +
      "REAL deltas (the window's oldest reads its predecessor)") {
    val (root, name, ev) = trickle(4)
    // versions: init + 3 appends = 4
    val full = graft.GraftSql.sql(spark, s"DESCRIBE HISTORY $name")
      .collect()
    assert(full.length == 4)
    val limited = graft.GraftSql.sql(spark,
      s"DESCRIBE HISTORY $name LIMIT 2").collect()
    assert(limited.length == 2)
    assert(limited.map(_.getLong(0)).toSeq ==
      full.map(_.getLong(0)).toSeq.takeRight(2))
    // the window's oldest row carries its true file-set delta — the
    // same numbers the full listing computed, not an all-added reset
    val fullByV = full.map(r => r.getLong(0) -> (r.getLong(6),
      r.getLong(7))).toMap
    limited.foreach { r =>
      assert((r.getLong(6), r.getLong(7)) == fullByV(r.getLong(0)))
    }
  }
}
