package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DeletionVectors => DV}

/** CTAS on the DV source (`CREATE TABLE ... USING graft-dv ... AS
  * SELECT`) — Spark's own CreateDataSourceTableAsSelect routing into
  * the writer face — and the 2-column Morton path of the zorder
  * rewrite (the 1-column form is DvAlterSpec's).
  */
class DvCtasSpec extends SparkSpec {

  test("CREATE TABLE ... AS SELECT creates, writes, and registers a " +
      "DV table through standard SQL; DML composes on it") {
    val root = Files.createTempDirectory("graft_dvctas").toString
    new java.io.File(root).delete()
    val name = s"dvctas_t_${math.abs(root.hashCode)}"
    graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(200)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(s"CREATE TABLE $name USING `graft-dv` OPTIONS " +
      s"(path '$root', partitionCol 'day') AS SELECT * FROM ${name}_src")
    assert(DV.exists(spark, root), "CTAS must commit a manifest")
    assert(spark.table(name).count() == 200)
    // the created table is fully mutable: DELETE through SQL
    graft.GraftSql.sql(spark,
      s"DELETE FROM $name WHERE user_id % 3 = 0").collect()
    val expect = spark.table(s"${name}_src")
      .filter(!(col("user_id") % 3 === 0)).count()
    assert(spark.table(name).count() == expect)
    assert(DV.history(spark, root).select("operation").head()
      .getString(0) == "init")
  }

  test("zorder on TWO columns interleaves both dimensions: content " +
      "invariant, both-axis stats tighten vs the scattered layout") {
    val root = Files.createTempDirectory("graft_dvz2").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .orderBy("event_id").limit(400)
      .localCheckpoint()
    DV.init(spark, ev.repartition(8), root, Seq("event_type"),
      statsCols = Seq("user_id", "value"))
    val sumBefore = DV.read(spark, root)
      .agg(sum("event_id"), count(lit(1))).head()

    val rewritten = DV.zorder(spark, root, Seq("user_id", "event_id"))
    assert(rewritten.nonEmpty)
    val after = DV.read(spark, root).agg(sum("event_id"), count(lit(1))).head()
    assert(after.getLong(0) == sumBefore.getLong(0) &&
      after.getLong(1) == sumBefore.getLong(1))
    assert(DV.history(spark, root).orderBy(desc("version"))
      .select("operation").head().getString(0) == "zorder")

    // per-file user_id spans must have TIGHTENED vs the hash-scattered
    // init (the z leading dimension); a 1-D sort proof lives in
    // DvAlterSpec — here we pin the 2-D code runs and clusters
    val spans = DV.manifest(spark, root).select("file").collect()
    assert(spans.length > 0)
    val m = graft.operators.Snapshots.readLatest(spark,
      DV.manifestTable(root))
      .filter(col("file") =!= "" && col("smin").isNotNull)
      .select(col("smin")("user_id").cast("long").as("lo"),
        col("smax")("user_id").cast("long").as("hi"))
      .collect()
    val b = ev.agg(min("user_id"), max("user_id")).head()
    val full = (b.getLong(1) - b.getLong(0)).toDouble
    val avgSpan = m.map(r => (r.getLong(1) - r.getLong(0)).toDouble)
      .sum / m.length
    assert(avgSpan < full * 0.8,
      f"2-D zorder left user_id unclustered: avg span $avgSpan%.0f of $full%.0f")
  }
}
