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
}
