package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.Standardise
import graft.sources.Tables

/** Pipeline observability via `Dataset.observe` — named metrics
  * collected DURING a query's normal execution (accumulator-backed, no
  * second scan). This is how a production run of the
  * standardise/enrich pipeline reports its data-quality counters
  * (rows in, nulls dropped, parse failures) without paying an extra
  * pass over 100 TB — the reference has no equivalent (its pandas
  * steps are re-counted by hand in tests).
  */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("observe() collects data-quality metrics in one pass") {
    val obs = Observation("standardise-metrics")
    val lineitem = Tables.lineitem(spark, sf)
    val observed = lineitem.observe(obs,
      count(lit(1)).as("rows_in"),
      count_if(col("l_quantity") <= 0).as("nonpositive_qty"),
      count_if(col("l_extendedprice").isNull).as("null_price"),
      round(sum(col("l_extendedprice").cast("decimal(28,4)")), 4)
        .cast("double").as("gross_revenue"))
    val out = observed.filter(col("l_quantity") > 0).count()
    val m = obs.get
    assert(m("rows_in").asInstanceOf[Long] == lineitem.count())
    assert(m("nonpositive_qty").asInstanceOf[Long] ==
      lineitem.count() - out)
    assert(m("null_price").asInstanceOf[Long] == 0L)
    assert(m("gross_revenue").asInstanceOf[Double] > 0.0)
  }

  test("observe() composes with the standardise cleaning expressions") {
    val raw = Seq(
      ("  Dune ", "Herbert", "43", "4.5 out of 5 stars", "1,234"),
      ("Dune", "Herbert", "58.99", "4.5 out of 5 stars", "1,234"),
      ("Emma", "Austen", "12", "no rating here", "12"))
      .toDF("title", "author", "price", "rating", "rating_count")
    val obs = Observation("clean-metrics")
    val cleaned = raw.select(
        Standardise.trimmed(col("title")).as("title"),
        col("author"),
        Standardise.parsePrice(col("price")).as("price"),
        Standardise.extractRating(col("rating")).as("rating"),
        Standardise.parseCount(col("rating_count")).as("rating_count"))
      .observe(obs,
        count(lit(1)).as("rows_out"),
        count_if(col("rating").isNull).as("unparsed_rating"),
        count_if(col("price").isNull).as("unparsed_price"))
    val n = cleaned.count()
    val m = obs.get
    assert(n == 3)
    assert(m("rows_out").asInstanceOf[Long] == 3L)
    // the "no rating here" row survives with a NULL rating — observed,
    // not silently dropped (reference NaN path, dag.py:141)
    assert(m("unparsed_rating").asInstanceOf[Long] == 1L)
    assert(m("unparsed_price").asInstanceOf[Long] == 0L)
  }
}
