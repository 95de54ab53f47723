package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV}

/** Small-file bin-packing on the DV table
  * ([[graft.operators.DeletionVectors.compactSmallFiles]], wired into
  * `OPTIMIZE`): the file-COUNT maintenance a CDC trickle needs —
  * purge's tombstone-fraction rule never fires on sliver files.
  */
class DvPackSpec extends SparkSpec {

  private def trickleTable(batches: Int): (String,
      org.apache.spark.sql.DataFrame) = {
    val root = Files.createTempDirectory("graft_dvpack").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(240)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .localCheckpoint()
    // slice by MODULO, not ranges: event_id is day-correlated in this
    // fact, so range slices would each land in different day dirs and
    // no dir would ever accumulate slivers
    def slice(b: Int) = ev.filter(pmod(col("event_id"),
      lit(batches.toLong)) === b)
    DV.init(spark, slice(0), root, "day")
    for (b <- 1 until batches)
      DV.append(spark, root, Seq("day"), slice(b))
    (root, ev)
  }

  test("a trickle's slivers pack to one file per partition dir; " +
      "masks fold in; the manifest log records the verb; idempotent") {
    val (root, ev) = trickleTable(8)
    val before = DV.manifest(spark, root).count()
    // per-dir sliver counts: every day dir holds several
    DV.delete(spark, root, "user_id",
      ev.select("user_id").distinct().filter(col("user_id") % 6 === 0))
    val kept = ev.filter(col("user_id") % 6 =!= 0)

    val packed = DV.compactSmallFiles(spark, root)
    assert(packed.nonEmpty && packed.size <= before)
    val after = DV.manifest(spark, root).count()
    assert(after < before, s"file count must drop: $before -> $after")
    // one replacement per partition dir (all slivers way under target)
    val perDir = DV.manifest(spark, root).select("file")
      .collect().map(_.getString(0))
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDir.values.forall(_.length == 1),
      s"expected one packed file per dir, got ${perDir.values
        .map(_.length).max} in one dir")
    // content invariant: masks folded into the replacements
    assert(DV.read(spark, root).count() == kept.count())
    assert(DV.read(spark, root).agg(sum("event_id")).head().getLong(0) ==
      kept.agg(sum("event_id")).head().getLong(0))
    // the verb is in the log; a second pass has nothing to do
    assert(DV.history(spark, root).orderBy(desc("version"))
      .select("operation").head().getString(0) == "compact")
    assert(DV.compactSmallFiles(spark, root).isEmpty)
  }

  test("bin caps honor the split target: a dir whose slivers exceed " +
      "the target packs to multiple bounded files, never one giant") {
    val (root, ev) = trickleTable(8)
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      DV.compactSmallFiles(spark, root, minBytes = 64L * 1024 * 1024): Unit
      val perDir = DV.manifest(spark, root)
        .select("file", "bytes").collect()
        .groupBy(r => r.getString(0)
          .substring(0, r.getString(0).lastIndexOf('/')))
      // at least one dir needed multiple bins, and packing still
      // merged (fewer files than the 8 slivers each dir started with)
      assert(perDir.values.exists(_.length > 1),
        "expected some dir to split across bins at a 4KB target")
      assert(perDir.values.forall(_.length < 8))
      assert(DV.read(spark, root).count() == ev.count())
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("OPTIMIZE runs the pack after the purge and reports it; the " +
      "second OPTIMIZE is a fixed point") {
    val (root, ev) = trickleTable(6)
    val name = s"dvpack_t_${math.abs(root.hashCode)}"
    spark.sql(s"CREATE TABLE $name USING `graft-dv` " +
      s"OPTIONS (path '$root')")
    val before = DV.manifest(spark, root).count()
    val out = graft.GraftSql.sql(spark, s"OPTIMIZE $name").head()
    assert(out.getLong(3) > 0, "expected small files packed")
    assert(DV.manifest(spark, root).count() < before)
    assert(spark.table(name).count() == ev.count())
    val out2 = graft.GraftSql.sql(spark, s"OPTIMIZE $name").head()
    assert(out2.getLong(0) == 0 && out2.getLong(2) == 0 &&
      out2.getLong(3) == 0, "second OPTIMIZE must be a fixed point")
  }
}
