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
