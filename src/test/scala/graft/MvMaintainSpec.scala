package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.plans.GraftPlans
import graft.queries.SqlSurface
import graft.sources.Tables
import graft.streaming.MvMaintain

/** Streaming incremental maintenance of the summary table: after every
  * drop the maintained summary must serve the SAME answers as the base
  * scan, a fact change the maintainer hasn't seen must decline (never
  * stale-serve), replay must be idempotent, and the compaction crash
  * window must be repaired at adoption.
  */
class MvMaintainSpec extends SparkSpec {

  private val grain = SqlSurface.q1Grain

  private def q1Of(of: DataFrame): DataFrame = {
    val aggs = SqlSurface.q1Aggs
    of.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("maintained summary serves each accumulated corpus; stale facts decline; replay and crash repair converge") {
    val dir = Files.createTempDirectory("graft_mvmaint").toString
    val (fact, ckpt, mvDir) = (s"$dir/fact", s"$dir/ckpt", s"$dir/summary")
    new java.io.File(fact).mkdirs()

    val li = Tables.lineitem(spark, sf)
    def third(i: Int): DataFrame = li.filter(col("l_orderkey") % 3 === i)
    def dropSlice(df: DataFrame, name: String): Unit = {
      val stage = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(fact, s"$name.parquet"))
    }

    val serving = spark.newSession()
    GraftPlans.ensureMvRewrite(serving)
    dropSlice(third(0), "d1")
    val factDf = () => serving.read.parquet(fact)
    val shapes =
      graft.plans.MvCatalog.deriveShapes(serving, factDf(), grain,
        SqlSurface.q1Aggs)

    def factStream = {
      val schema = spark.read.parquet(fact).schema
      spark.readStream.schema(schema).parquet(fact)
    }
    def runMaintainer(): Unit = {
      val q = MvMaintain.maintain(factStream, ckpt, mvDir, grain, shapes,
        Trigger.AvailableNow())
      try q.awaitTermination(120000) finally q.stop()
    }

    // drop 1: maintained summary serves the first slice
    runMaintainer()
    MvMaintain.adoptMaintained(serving, factDf(), grain, shapes, mvDir)
    val served1 = q1Of(factDf())
    assert(plan(served1).contains("summary"),
      s"first drop not served from the summary:\n${plan(served1)}")
    assert(served1.collect().toSeq ==
      q1Of(spark.read.parquet(fact)).collect().toSeq)

    // drop 2 WITHOUT maintenance: freshness guard must decline —
    // correct answers from the base scan, never a stale summary
    dropSlice(third(1), "d2")
    val declined = q1Of(factDf())
    assert(!plan(declined).contains("summary"),
      s"stale summary served a changed fact:\n${plan(declined)}")
    assert(declined.collect().toSeq ==
      q1Of(spark.read.parquet(fact)).collect().toSeq)

    // maintainer catches up from its checkpoint: serves again
    runMaintainer()
    MvMaintain.adoptMaintained(serving, factDf(), grain, shapes, mvDir)
    val served2 = q1Of(factDf())
    assert(plan(served2).contains("summary"))
    assert(served2.collect().toSeq ==
      q1Of(spark.read.parquet(fact)).collect().toSeq)

    // replay idempotency: re-applying a batch under its own id
    // dynamic-overwrites exactly its slice — the merged summary is
    // unchanged
    val before = MvMaintain.merged(spark, mvDir, grain, shapes)
      .collect().map(_.toString).sorted
    MvMaintain.applyBatch(spark, spark.read.parquet(s"$fact/d2.parquet"),
      1L, mvDir, grain, shapes)
    val after = MvMaintain.merged(spark, mvDir, grain, shapes)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before), "batch replay changed the summary")

    // compaction crash residue: the folded slice landed, its inputs
    // were never deleted — duplicate (grain, sid) rows on disk. The
    // adopt-time repair must converge and serving must stay exact.
    val pfs = new java.io.File(mvDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
    val victim = pfs.head.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("slice=")).head
    val dup = new java.io.File(victim.getParentFile, "slice=crashdup")
    org.apache.commons.io.FileUtils.copyDirectory(victim, dup)
    val corrupted = MvMaintain.merged(spark, mvDir, grain, shapes)
      .collect().map(_.toString).sorted
    assert(corrupted.sameElements(before),
      "keyed merge itself must already tolerate duplicate partials")
    MvMaintain.adoptMaintained(serving, factDf(), grain, shapes, mvDir)
    val servedR = q1Of(factDf())
    assert(plan(servedR).contains("summary"))
    assert(servedR.collect().toSeq ==
      q1Of(spark.read.parquet(fact)).collect().toSeq,
      "crash-repair did not restore exact serving")
    // and the duplicates are physically gone (raw rows unique per key)
    val raw = spark.read.parquet(mvDir)
    assert(raw.count() ==
      raw.dropDuplicates(grain :+ "sid").count(),
      "repair left duplicate partials on disk")
  }

  test("star summary maintains from fact deltas joined to static dims") {
    import graft.queries.ScaleQueries
    val dir = Files.createTempDirectory("graft_mvstar_ivm").toString
    val (factDrop, ckpt, mvDir) = (s"$dir/fact", s"$dir/ckpt", s"$dir/summary")
    new java.io.File(factDrop).mkdirs()

    val orders = Tables.orders(spark, sf)
    def half(i: Int): DataFrame = orders.filter(col("o_orderkey") % 2 === i)
    def dropSlice(df: DataFrame, name: String): Unit = {
      val stage = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(factDrop, s"$name.parquet"))
    }

    val serving = spark.newSession()
    GraftPlans.ensureMvRewrite(serving)
    dropSlice(half(0), "d1")
    // the registered star: the STREAMED fact dir joined to the static dims
    def starOf(ss: org.apache.spark.sql.SparkSession): DataFrame =
      ss.read.parquet(factDrop)
        .join(Tables.customer(ss, sf), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(ss, sf), col("c_nationkey") === col("n_nationkey"))
    val shapes = graft.plans.MvCatalog.deriveShapes(serving, starOf(serving),
      ScaleQueries.starGrain, ScaleQueries.starAggs)

    // fact-delta ⋈ dims per batch — the star prepare hook
    val enrich: DataFrame => DataFrame = b =>
      b.join(Tables.customer(b.sparkSession, sf),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(b.sparkSession, sf),
          col("c_nationkey") === col("n_nationkey"))
    def runMaintainer(): Unit = {
      val schema = spark.read.parquet(factDrop).schema
      val stream = spark.readStream.schema(schema).parquet(factDrop)
      val q = MvMaintain.maintain(stream, ckpt, mvDir,
        ScaleQueries.starGrain, shapes,
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        prepare = enrich)
      try q.awaitTermination(120000) finally q.stop()
    }

    runMaintainer()
    MvMaintain.adoptMaintained(serving, starOf(serving),
      ScaleQueries.starGrain, shapes, mvDir)
    val served1 = ScaleQueries.starQuery(starOf(serving))
    assert(plan(served1).contains("summary") && !plan(served1).contains("Join"),
      s"maintained star summary not served join-free:\n${plan(served1)}")
    assert(served1.collect().toSeq ==
      ScaleQueries.starQuery(starOf(spark)).collect().toSeq)

    // second fact delta: catch up from the checkpoint, serve the union
    dropSlice(half(1), "d2")
    runMaintainer()
    MvMaintain.adoptMaintained(serving, starOf(serving),
      ScaleQueries.starGrain, shapes, mvDir)
    val served2 = ScaleQueries.starQuery(starOf(serving))
    assert(plan(served2).contains("summary"))
    assert(served2.collect().toSeq ==
      ScaleQueries.starQuery(starOf(spark)).collect().toSeq,
      "maintained star summary diverged from the batch join recompute")
  }

  test("min/max partials maintain under appends and serve subset queries") {
    val dir = Files.createTempDirectory("graft_mvminmax").toString
    val (fact, mvDir) = (s"$dir/fact", s"$dir/summary")
    val li = Tables.lineitem(spark, sf)
    li.filter(col("l_orderkey") % 2 === 0).write.mode("overwrite")
      .parquet(fact)

    val serving = spark.newSession()
    GraftPlans.ensureMvRewrite(serving)
    val aggs = SqlSurface.q1Aggs ++ Seq(
      min(col("l_discount")).as("min_disc"),
      max(col("l_discount")).as("max_disc"))
    val shapes = graft.plans.MvCatalog.deriveShapes(
      serving, serving.read.parquet(fact), grain, aggs)

    MvMaintain.applyBatch(spark, spark.read.parquet(fact), 0L, mvDir,
      grain, shapes)
    MvMaintain.adoptMaintained(serving, serving.read.parquet(fact),
      grain, shapes, mvDir)

    def subset(of: DataFrame): DataFrame =
      of.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"))
        .orderBy(col("l_returnflag"))

    val served = subset(serving.read.parquet(fact))
    assert(plan(served).contains("summary"),
      s"min/max subset not served:\n${plan(served)}")
    assert(served.collect().toSeq ==
      subset(spark.read.parquet(fact)).collect().toSeq)

    // append-only update keeps min/max maintainable: a second batch
    // with new extremes merges exactly
    val b2 = li.filter(col("l_orderkey") % 2 === 1)
    b2.write.mode("append").parquet(fact)
    MvMaintain.applyBatch(spark, b2, 1L, mvDir, grain, shapes)
    MvMaintain.adoptMaintained(serving, serving.read.parquet(fact),
      grain, shapes, mvDir)
    val served2 = subset(serving.read.parquet(fact))
    assert(plan(served2).contains("summary"))
    assert(served2.collect().toSeq ==
      subset(spark.read.parquet(fact)).collect().toSeq)
  }
}
