package graft

import graft.plans.MvAdvisor
import graft.queries.Registry

/** Pins the advisor's DISCOVERY side — which candidates the workload's
  * optimized plans yield and which queries are rejected, and why. The
  * measurement + cover/recommend side is oracle-gated (`mv_advisor`
  * hash-matches a DuckDB twin that re-encodes the profitable-cover
  * rule over live counts at every scale factor).
  */
class MvAdvisorSpec extends SparkSpec {

  private def cand(name: String): Option[MvAdvisor.Candidate] =
    MvAdvisor.candidateOf(name, Registry.byName(name).build(spark, sf))

  test("filter columns fold into the grain (Q1's shipdate predicate)") {
    val c = cand("agg_tpch_q1").get
    assert(c.tables == Seq("lineitem"))
    assert(c.grain == Seq("l_linestatus", "l_returnflag", "l_shipdate"),
      s"got ${c.grain}")
  }

  test("star candidate: inferred join-key null checks do not leak into the grain") {
    val c = cand("join_inner_agg").get
    assert(c.tables == Seq("customer", "nation", "orders"))
    assert(c.grain == Seq("n_name"),
      s"join-key IsNotNull conjuncts leaked: ${c.grain}")
  }

  test("computed aggregate inputs pass (advisor-loose projects), grain stays plain") {
    assert(cand("agg_group").map(_.grain)
      .contains(Seq("l_linestatus", "l_returnflag")))
    assert(cand("agg_stats_exact").map(_.grain)
      .contains(Seq("l_returnflag")))
  }

  test("percentile aggregates are rejected: not maintainable from stored partials") {
    assert(cand("agg_median").isEmpty,
      "agg_median's percentile survived the IVM-able whitelist")
  }

  test("expression grains are rejected: date_trunc grouping is not a relation column") {
    assert(cand("agg_monthly").isEmpty,
      "agg_monthly's date_trunc grain is not re-derivable from stored partials")
  }

  test("distinct aggregates are rejected") {
    import org.apache.spark.sql.functions._
    val df = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
    assert(MvAdvisor.candidateOf("synthetic_distinct", df).isEmpty,
      "count(DISTINCT) is not mergeable partial state and must be rejected")
  }

  test("avg is rejected: the rewrite has no avg decomposition") {
    import org.apache.spark.sql.functions._
    val df = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("aq"))
    assert(MvAdvisor.candidateOf("synthetic_avg", df).isEmpty,
      "avg() survived the whitelist but deriveShapes/deriveAgg cannot " +
        "store or re-derive it — the advisor would recommend a summary " +
        "that can never serve")
  }

  test("an alias shared by several aggregates is rejected, not crashed on") {
    import org.apache.spark.sql.functions._
    // the derived column is referenced by TWO aggregates, so Catalyst
    // keeps the computing Project (CollapseProject refuses to
    // duplicate non-cheap expressions) and the aggregate inputs stay
    // Project-local attributes — their sql would never resolve against
    // the rebuilt fact at registration time
    val df = graft.sources.Tables.lineitem(spark, sf)
      .withColumn("disc_price",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("disc_price")).as("s"), min(col("disc_price")).as("m"))
    assert(MvAdvisor.candidateOf("synthetic_shared_alias", df).isEmpty,
      "aggregate inputs referencing Project-local aliases must reject " +
        "the candidate (registration would throw an AnalysisException)")
  }
}
