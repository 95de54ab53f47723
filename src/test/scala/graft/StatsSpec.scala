package graft

import org.apache.spark.sql.functions._
import graft.queries.StatsQueries

/** Error-bound checks for the sketch aggregates whose raw values are
  * engine-specific: the estimate must still be provably close to the
  * exact answer. The registry queries emit `within_5pct` booleans the
  * oracle hash-checks; these specs pin the TIGHTER rank-error bound on
  * the raw estimates the query no longer exposes.
  */
class StatsSpec extends SparkSpec {

  private def sfDir = "/root/testdata/sf0.01"

  test("approx_percentile is within the GK rank-error bound of exact") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"))
    // raw GK estimates (the registry query folds these into booleans)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("a90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

    for ((flag, (a50, a90)) <- approx) {
      val vals = li.filter(col("l_returnflag") === flag)
      val n = vals.count().toDouble
      // Quantities are integral (1..50) with heavy ties, so a value v
      // occupies the whole rank interval [frac(<v), frac(≤v)]. v is a
      // correct q-percentile iff that interval overlaps [q−ε, q+ε];
      // GK accuracy 10000 ⇒ ε ≤ 1e-4, allow 0.01 slack.
      def rankOk(v: Double, q: Double): Boolean = {
        val lo = vals.filter(col("l_quantity") < v).count() / n
        val hi = vals.filter(col("l_quantity") <= v).count() / n
        lo - 0.01 <= q && q <= hi + 0.01
      }
      assert(rankOk(a50, 0.5), s"$flag p50=$a50 outside rank bound")
      assert(rankOk(a90, 0.9), s"$flag p90=$a90 outside rank bound")
    }
    assert(approx.size === 3)
  }

  test("agg_approx_percentile emits all-true bound flags and exact percentiles") {
    val rows = StatsQueries.approxPercentile(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_5pct"), s"p50 bound failed: $r")
      assert(r.getAs[Boolean]("p90_within_5pct"), s"p90 bound failed: $r")
      assert(r.getAs[Double]("p50_exact") > 0)
    }
  }

  test("sketch_cms_freq: one-sided guarantee and CMS error envelope") {
    val rows = StatsQueries.cmsFreq(spark, sfDir).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val totalTokens = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    rows.foreach { r =>
      val t = r.getAs[Long]("n_true"); val e = r.getAs[Long]("n_est")
      // CMS never undercounts: every counter the word addresses holds
      // its own count plus non-negative collision mass
      assert(r.getAs[Boolean]("est_ge_true"), s"undercount: $r")
      assert(e >= t && e <= totalTokens)
      // per-row expected overcount is N/W; min over 4 independent rows
      // staying under 8·N/W is a loose deterministic-data envelope
      // (measured: top words collide with ~0-2 small words here)
      assert(e - t <= 8L * totalTokens / 1024L, s"overcount beyond envelope: $r")
    }
    // ranking by exact count is descending
    val trues = rows.map(_.getAs[Long]("n_true")).toSeq
    assert(trues == trues.sorted.reverse)
  }
}
