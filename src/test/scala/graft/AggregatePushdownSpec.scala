package graft

import org.apache.spark.sql.functions._

/** Parquet aggregate pushdown: whole-table COUNT/MIN/MAX answered from
  * parquet footer statistics instead of scanning data pages — at 100 TB
  * the difference between touching every page and touching only file
  * metadata.
  *
  * `spark.sql.parquet.aggregatePushdown` gates it (DSv2 parquet reads,
  * which this Spark build plans as `BatchScan` by default). When the
  * flag is off — or the aggregate is over a type whose footer stats
  * Spark won't trust, e.g. timestamps — the plan silently falls back to
  * a full scan with identical results: a correctness-invisible 1000×
  * regression, which is exactly why the plan shape is pinned by test.
  */
class AggregatePushdownSpec extends SparkSpec {

  private def aggPlan(pushdown: Boolean): (String, Seq[Any]) = {
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    s.conf.set("spark.sql.parquet.aggregatePushdown", pushdown.toString)
    val df = s.read.parquet(s"$sf/lineitem.parquet")
      .agg(count(lit(1)).as("n"),
        min(col("l_orderkey")).as("lo"),
        max(col("l_orderkey")).as("hi"))
    (df.queryExecution.executedPlan.toString, df.collect().head.toSeq)
  }

  test("count/min/max are answered from parquet footers when enabled") {
    val (plan, rows) = aggPlan(pushdown = true)
    assert(plan.contains("PushedAggregation: [COUNT(*)"), plan)
    assert(plan.contains("MIN(l_orderkey)") && plan.contains("MAX(l_orderkey)"), plan)
    val (offPlan, expected) = aggPlan(pushdown = false)
    assert(offPlan.contains("PushedAggregation: []"), offPlan)
    assert(rows == expected) // footer stats agree with the full scan
  }

  test("timestamp min/max is not pushed — footer stats fall back to scan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val df = s.read.parquet(s"$sf/lineitem.parquet")
      .agg(min(col("l_shipdate")).as("lo"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: []"), plan)
  }
}
