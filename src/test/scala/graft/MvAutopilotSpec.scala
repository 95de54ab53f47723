package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Registry, ScaleQueries}

/** The composed advisor→register→serve path (`mv_autopilot`): the
  * advisor's recommendations, registered verbatim (fact frames rebuilt
  * from discovered plan fragments, aggregate shapes lifted from the
  * discovered aggregate expressions), must make the optimizer serve
  * the covered workload queries from the auto-built summaries — and
  * leave the uncovered ones on their base plans, still correct. At
  * this spec's scale factor (sf0.001) the profitable lineitem cover is
  * agg_group's own (l_linestatus, l_returnflag) grain — the
  * filter-extended Q1 grain compresses 1x and is NOT registered.
  */
class MvAutopilotSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The memoized serving session `mvAutopilot` registered on. */
  private def servingSessionOf(sfDir: String): SparkSession =
    ScaleQueries.mvAutopilot(spark, sfDir).sparkSession

  test("agg_group serves from an advisor-selected, auto-registered summary") {
    val served = ScaleQueries.mvAutopilot(spark, sf)
    val p = plan(served)
    assert(p.contains("graft_mv_auto_"), s"auto summary not scanned:\n$p")
    assert(!p.contains("lineitem.parquet"), s"fact still scanned:\n$p")
    val base = Registry.byName("agg_group").build(spark, sf)
    assert(served.collect().toSeq == base.collect().toSeq,
      "autopilot-served agg_group differs from the base compute")
  }

  test("the coarser covered query serves from the same summary by roll-up") {
    val serving = servingSessionOf(sf)
    val q = Registry.byName("agg_stats_exact").build(serving, sf)
    val p = plan(q)
    assert(p.contains("graft_mv_auto_"),
      s"covered coarser grain not served from the cover:\n$p")
    val base = Registry.byName("agg_stats_exact").build(spark, sf)
    assert(q.collect().toSeq == base.collect().toSeq)
  }

  test("the star recommendation registers too: join_inner_agg serves join-free") {
    val serving = servingSessionOf(sf)
    val q = Registry.byName("join_inner_agg").build(serving, sf)
    val p = plan(q)
    assert(p.contains("graft_mv_auto_"), s"star summary not scanned:\n$p")
    assert(!p.contains("Join"), s"a join survived the auto rewrite:\n$p")
    val base = Registry.byName("join_inner_agg").build(spark, sf)
    assert(q.collect().toSeq == base.collect().toSeq)
  }

  test("the unprofitable candidate stays on its base plan, still correct") {
    val serving = servingSessionOf(sf)
    // at sf0.001 the Q1 filter-extended grain compresses 1x: the
    // advisor must NOT have registered it, and its finer grain is not
    // covered by the registered (l_linestatus, l_returnflag) summary
    // (l_shipdate is missing there), so Q1 runs on the fact
    val q = Registry.byName("agg_tpch_q1").build(serving, sf)
    val p = plan(q)
    assert(p.contains("lineitem.parquet"),
      s"Q1 should have fallen back to the base fact scan:\n$p")
    val base = Registry.byName("agg_tpch_q1").build(spark, sf)
    assert(q.collect().toSeq == base.collect().toSeq)
  }
}
