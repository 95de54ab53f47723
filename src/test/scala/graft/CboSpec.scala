package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join

import graft.queries.BreadthQueries

/** Cost-based join reordering: with ANALYZE stats the optimizer joins
  * the filtered dim first; without stats the written (bad) order
  * survives — both directions pinned so the reorder is provably
  * stats-driven, plus result equality between the two plans.
  */
class CboSpec extends SparkSpec {

  /** Leaf table tags under the INNERMOST join of the optimized plan
    * (the join neither of whose subtrees contains another join).
    */
  private def innermostJoinTables(df: DataFrame): Set[String] = {
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"no joins in optimized plan:\n$plan")
    val inner = joins.filter(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    assert(inner.size == 1, s"expected one innermost join, got $inner")
    inner.head.collectLeaves().map(_.toString).flatMap { leaf =>
      Seq("graft_cbo_li", "graft_cbo_ord", "graft_cbo_cust")
        .filter(leaf.contains)
    }.toSet
  }

  test("with ANALYZE stats, JoinReorderDP joins the filtered dim " +
      "first despite the written fact-first order") {
    val df = BreadthQueries.cboQuery(spark, sf, stats = true)
    assert(innermostJoinTables(df) == Set("graft_cbo_ord", "graft_cbo_cust"),
      df.queryExecution.optimizedPlan.toString)
  }

  test("without stats, the written join order survives — the reorder " +
      "is stats-driven, not incidental") {
    val df = BreadthQueries.cboQuery(spark, sf, stats = false)
    assert(innermostJoinTables(df) == Set("graft_cbo_li", "graft_cbo_ord"),
      df.queryExecution.optimizedPlan.toString)
  }

  test("both plans agree on the answer") {
    val a = BreadthQueries.cboQuery(spark, sf, stats = true)
      .collect().map(_.toString).toSeq
    val b = BreadthQueries.cboQuery(spark, sf, stats = false)
      .collect().map(_.toString).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  /** Round-12: the same reorder on DV-BACKED tables, driven by
    * `ANALYZE ... FOR ALL COLUMNS` ([[graft.plans
    * .DvAnalyzeColumnsCommand]]) — column NDV/null/min-max computed
    * over the masked read and landed in the catalog, so
    * FilterEstimation can price `c_acctbal > 9000` and JoinReorderDP
    * joins the filtered dim first on a mutable table too.
    */
  private def dvCboQuery(stats: Boolean): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.{DeletionVectors => DV}
    import graft.sources.Tables
    val s = spark.newSession()
    if (stats) {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    }
    val sfx = if (stats) "s" else "n"
    val tmp = System.getProperty("java.io.tmpdir")
    def mk(name: String, src: DataFrame, key: String): String = {
      val root = s"$tmp/graft_dvcbo_${name}_$sfx"
      val full = s"graft_cbo_${name}_dv_$sfx"
      new java.io.File(root) match {
        case f if f.exists() =>
          def rm(x: java.io.File): Unit = {
            if (x.isDirectory) x.listFiles().foreach(rm)
            x.delete(): Unit
          }
          rm(f)
        case _ => ()
      }
      DV.init(s, src.withColumn("pb",
        pmod(col(key), lit(2)).cast("string")), root, "pb")
      s.sql(s"DROP TABLE IF EXISTS $full")
      s.sql(s"CREATE TABLE $full USING `graft-dv` OPTIONS (path '$root')")
      if (stats) graft.GraftSql.sql(s,
        s"ANALYZE TABLE $full COMPUTE STATISTICS FOR ALL COLUMNS")
        .collect(): Unit
      full
    }
    val li = mk("li", Tables.lineitem(s, sf)
      .select("l_orderkey", "l_extendedprice"), "l_orderkey")
    val ord = mk("ord", Tables.orders(s, sf)
      .select("o_orderkey", "o_custkey"), "o_orderkey")
    val cust = mk("cust", Tables.customer(s, sf)
      .select("c_custkey", "c_mktsegment", "c_acctbal"), "c_custkey")
    s.sql(
      s"""SELECT c_mktsegment, count(*) AS n_items
         |FROM $li l
         |JOIN $ord o ON l.l_orderkey = o.o_orderkey
         |JOIN $cust c ON o.o_custkey = c.c_custkey
         |WHERE c.c_acctbal > 9000
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  private def dvInnermost(df: DataFrame): Set[String] = {
    val joins = df.queryExecution.optimizedPlan
      .collect { case j: Join => j }
    val inner = joins.filter(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    assert(inner.size == 1)
    inner.head.collectLeaves().map(_.toString).flatMap { leaf =>
      Seq("dvcbo_li", "dvcbo_ord", "dvcbo_cust").filter(leaf.contains)
    }.toSet
  }

  /** Equi-height HISTOGRAMS on a SKEWED key: an equality filter on
    * the FREQUENT value estimates rows/ndv without them (the
    * skew-blind guess — a few dozen rows) but ~95% of the table with
    * them (the bin holding the literal), and JoinReorderDP flips the
    * join ORDER on that cardinality: skew-blind, the "tiny" filtered
    * fact joins first; histogram-informed, the genuinely small dim
    * pair goes innermost. Asserted on the optimized plan — the
    * reorder runs where the catalog stats live (pre-swap), exactly
    * like the NDV-driven flip above.
    */
  private def dvHistJoin(hist: Boolean)
      : (Set[String], Seq[String]) = {
    import org.apache.spark.sql.functions._
    import graft.operators.{DeletionVectors => DV}
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.statistics.histogram.enabled", hist.toString)
    val sfx = if (hist) "h" else "n"
    val tmp = System.getProperty("java.io.tmpdir")
    def mk(name: String, src: org.apache.spark.sql.DataFrame): String = {
      val root = s"$tmp/graft_dvhist_${name}_$sfx"
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(): Unit
      }
      rm(new java.io.File(root))
      DV.init(s, src, root, "pb")
      val full = s"graft_hist_${name}_$sfx"
      s.sql(s"DROP TABLE IF EXISTS $full")
      s.sql(s"CREATE TABLE $full USING `graft-dv` OPTIONS (path '$root')")
      graft.GraftSql.sql(s,
        s"ANALYZE TABLE $full COMPUTE STATISTICS FOR ALL COLUMNS")
        .collect(): Unit
      full
    }
    val ev = graft.sources.Tables.events(s, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("pb", pmod(col("event_id"), lit(2)).cast("string"))
    // ~95% of fact rows carry k = 1; the rest scatter over many
    // values — ndv(k) is high, so rows/ndv wildly underestimates
    // the `k = 1` filter that the reorder costs the fact side with
    val fact = mk("fact", ev.withColumn("k",
      when(col("event_id") % 20 =!= 0, lit(1L))
        .otherwise(pmod(col("event_id"), lit(1000)) + 2)))
    val mid = mk("mid", ev.select("event_id", "user_id", "pb"))
    val sml = mk("sml", ev.filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("value"), col("pb")))
    val q = s.sql(
      s"""SELECT count(*) AS n, sum(m.user_id) AS us
         |FROM $fact f
         |JOIN $mid m ON f.event_id = m.event_id
         |JOIN $sml c ON m.event_id = c.event_id
         |WHERE f.k = 1""".stripMargin)
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    val inner = joins.filter(j => j.children.forall(ch =>
      ch.collect { case x:
        org.apache.spark.sql.catalyst.plans.logical.Join => x }.isEmpty))
    assert(inner.size == 1)
    val names = inner.head.collectLeaves().map(_.toString).flatMap {
      leaf => Seq("fact", "mid", "sml")
        .filter(n => leaf.contains(s"graft_hist_${n}_$sfx") ||
          leaf.contains(s"graft_dvhist_${n}_$sfx"))
    }.toSet
    (names, q.collect().map(_.toString).toSeq)
  }

  test("DV histograms (ANALYZE under histogram.enabled): the " +
      "frequent-value cardinality flips the JOIN ORDER — skew-blind " +
      "stats join the 'tiny' filtered fact first, the histogram puts " +
      "the genuinely small pair innermost; answers agree") {
    val (noHist, rowsN) = dvHistJoin(hist = false)
    val (withHist, rowsH) = dvHistJoin(hist = true)
    assert(noHist.contains("fact"),
      s"rows/ndv underestimates the frequent key — the filtered fact " +
        s"must look cheapest to join first (got $noHist)")
    assert(!withHist.contains("fact") && withHist == Set("mid", "sml"),
      s"the histogram prices k=1 at ~95% of the fact — the small " +
        s"pair must go innermost (got $withHist)")
    assert(rowsN == rowsH,
      "the flip is a plan change, never an answer change")
  }

  test("DV tables: ANALYZE FOR ALL COLUMNS lands column stats and " +
      "flips the join order; without stats the written order survives") {
    assert(dvInnermost(dvCboQuery(stats = true)) ==
      Set("dvcbo_ord", "dvcbo_cust"))
    assert(dvInnermost(dvCboQuery(stats = false)) ==
      Set("dvcbo_li", "dvcbo_ord"))
    // and the two answers agree
    assert(dvCboQuery(stats = true).collect().map(_.toString).toSeq ==
      dvCboQuery(stats = false).collect().map(_.toString).toSeq)
  }
}
