package graft

import org.apache.spark.sql.functions._
import graft.queries.StatsQueries

/** Error-bound checks for the sketch aggregates whose values are
  * engine-specific (and therefore rows-only in the driver gate):
  * the estimate must still be provably close to the exact answer.
  */
class StatsSpec extends SparkSpec {

  private def sfDir = "/root/testdata/sf0.01"

  test("approx_percentile is within the GK rank-error bound of exact") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"))
    val approx = StatsQueries.approxPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

    for ((flag, Seq(a50, a90)) <- approx) {
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
}
