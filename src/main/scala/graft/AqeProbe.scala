package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** AQE × CBO interaction probe (round-10 verdict stretch item): what
  * does ADAPTIVE execution do to the worst-first join order that
  * `cbo_join_reorder` fixes with STATISTICS — does runtime
  * re-optimization rescue the no-stats case?
  *
  * Setup mirrors the cbo query's shape: lineitem ⋈ orders written
  * FIRST (fact⋈fact), the selective customer dim appended LAST, no
  * catalog statistics anywhere (temp views), broadcast threshold
  * pinned low enough that the STATIC planner cannot broadcast the
  * unfiltered dim — so any broadcast conversion observed is AQE's
  * runtime decision from real shuffle sizes. Two runs, AQE off/on,
  * at 1x and SPARK_GRAFT_PROBE_SCALE-x lineitem. Reported per run:
  * wall, total shuffle-read bytes (task metrics), and the join
  * strategies of the FINAL executed plan.
  *
  * The expected (and measured — PLANS.md "Round 10") split: AQE
  * rescues the join STRATEGY (the post-filter dim side measures
  * small at runtime → sort-merge flips to broadcast, partitions
  * coalesce) but NOT the join ORDER — the fact⋈fact shuffle still
  * runs first and dominates shuffle bytes, because AQE re-plans
  * stage boundaries, not the join tree. Order repair needs
  * stats-driven CBO reorder (`cbo_join_reorder`), which is why the
  * engine carries both.
  */
object AqeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "10").toInt
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = System.getProperty("java.io.tmpdir")

    // scaled lineitem replicas with disjoint orderkeys (the LakeProbe
    // recipe); orders/customer stay 1x — the dim is the SMALL side
    val liScaled = s"$tmp/graft_aqeprobe_li_$scale"
    if (!new java.io.File(liScaled).exists()) {
      val li = Tables.lineitem(spark, sfDir)
      val okOff = 100000000L
      Seq.tabulate(scale) { r =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(r * okOff))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(liScaled)
    }
    val ordScaled = s"$tmp/graft_aqeprobe_ord_$scale"
    if (!new java.io.File(ordScaled).exists()) {
      val ord = Tables.orders(spark, sfDir)
      val okOff = 100000000L
      Seq.tabulate(scale) { r =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(r * okOff))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(ordScaled)
    }

    def run(tag: String, liPath: Option[String], ordPath: Option[String],
        aqe: Boolean): Unit = {
      val s = spark.newSession()
      s.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      // static broadcast OFF (the no-stats planner sees only file
      // sizes and would broadcast the dim anyway, hiding the effect);
      // AQE gets its own runtime threshold, so any broadcast observed
      // is a runtime decision from measured shuffle sizes
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
        (8 << 20).toString)
      val li = liPath.map(s.read.parquet(_))
        .getOrElse(Tables.lineitem(s, sfDir))
      val ord = ordPath.map(s.read.parquet(_))
        .getOrElse(Tables.orders(s, sfDir))
      li.createOrReplaceTempView("p_li")
      ord.createOrReplaceTempView("p_ord")
      Tables.customer(s, sfDir).createOrReplaceTempView("p_cust")

      val shuffleRead = new AtomicLong
      val listener = new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shuffleRead.addAndGet(
              e.taskMetrics.shuffleReadMetrics.totalBytesRead): Unit
      }
      s.sparkContext.addSparkListener(listener)
      val df = s.sql(
        """SELECT c_mktsegment, count(*) AS n, sum(l_extendedprice) AS rev
          |FROM p_li l
          |JOIN p_ord o ON l.l_orderkey = o.o_orderkey
          |JOIN p_cust c ON o.o_custkey = c.c_custkey
          |WHERE c.c_acctbal > 9000
          |GROUP BY c_mktsegment""".stripMargin)
      val t0 = System.nanoTime()
      df.collect(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain the listener bus
      s.sparkContext.removeSparkListener(listener)

      // AQE's executed-plan string appends an "== Initial Plan =="
      // section after the final plan — count joins in the FINAL
      // section only, or every operator is double-counted
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      def n(p: String) = p.r.findAllIn(plan).size
      println(f"[aqeprobe] $tag aqe=$aqe: wall=$wall%.2fs " +
        f"shuffleRead=${shuffleRead.get / 1024.0 / 1024.0}%.1fMB " +
        s"SMJ=${n("SortMergeJoin")} BHJ=${n("BroadcastHashJoin")} " +
        s"finalPlan=${plan.contains("isFinalPlan=true")}")
    }

    for (aqe <- Seq(false, true)) run("1x", None, None, aqe)
    for (aqe <- Seq(false, true))
      run(s"${scale}x", Some(liScaled), Some(ordScaled), aqe)
    spark.stop()
  }
}
