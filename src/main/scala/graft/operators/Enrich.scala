package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped enrichment metrics — the Spark-native form of the reference's
  * `enrich_book_data` (`/root/reference/dags/dag.py:153-184`).
  *
  * The reference runs FOUR separate pandas `groupby('Author')` passes
  * (weighted sum :167, sum :170, mean :177, size :181) and recombines
  * them with THREE inner merges (:173,178,182). Here the whole thing is
  * ONE `groupBy().agg(...)`: a single shuffle, partial (map-side)
  * aggregation before it, and whole-stage codegen throughout. At 100 TB
  * this is the difference between one pass over the fact table and four.
  *
  * == Cross-engine float determinism ==
  * Two distinct hazards when hash-comparing against a DuckDB oracle:
  *  1. double SUM is summation-order dependent → all sums here run in
  *     DECIMAL (exact, order-free), cast to double only at the end.
  *  2. `round(x, 4)` on a quotient: sum/count quotients DO land exactly
  *     on `…xxxx5` midpoints (a 2-decimal sum over a small count), and
  *     Spark's BigDecimal HALF_UP disagrees with DuckDB's double round
  *     there → averages are rounded via [[roundDiv4]], pure integer
  *     arithmetic with identical semantics in both engines.
  */
object Enrich {

  /** Exact sum: cast to decimal so partial/final aggregation order
    * cannot change the result, then back to double for the output.
    */
  def exactSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Exact `a div b` for non-negative integral decimal columns.
    * `a - pmod(a,b)` is an exact multiple of b, so the decimal division
    * terminates — no quotient rounding anywhere.
    */
  private def intDiv(a: Column, b: Column): Column = {
    val ad = a.cast("decimal(38,0)")
    val bd = b.cast("decimal(38,0)")
    ((ad - pmod(ad, bd)) / bd).cast("decimal(38,0)")
  }

  /** `round(n/d, 4)` HALF_UP computed in exact integer arithmetic:
    * `floor((2·n·10⁴ + d) / (2·d)) / 10⁴`. Deterministic across engines
    * even when n/d sits exactly on a rounding midpoint. n, d must be
    * integral-valued and non-negative, d > 0.
    */
  def roundDiv4(n: Column, d: Column): Column =
    intDiv(n.cast("decimal(38,0)") * 20000 + d.cast("decimal(38,0)"),
        d.cast("decimal(38,0)") * 2)
      .cast("double") / 10000.0

  /** The DuckDB-SQL twin of [[roundDiv4]] (HUGEINT `//` is exact). */
  def roundDiv4Sql(n: String, d: String): String =
    s"CAST((2*CAST($n AS HUGEINT)*10000 + CAST($d AS HUGEINT)) // (2*CAST($d AS HUGEINT)) AS DOUBLE)/10000.0"

  /** All enrichment aggregates in one pass over a fact frame.
    *
    * @param valueCol   weighted value (reference: Rating); exact at
    *                   `valueScale` decimal digits
    * @param valueScale decimal digits of valueCol (rating: 1, price: 2)
    * @param weightCol  integral-valued weight (reference: Rating_count)
    * @param priceCol   plain-mean column (reference: Price); exact at
    *                   `priceScale` digits
    */
  def metrics(df: DataFrame, groupCols: Seq[Column],
              valueCol: Column, valueScale: Int, weightCol: Column,
              priceCol: Column, priceScale: Int = 2): DataFrame = {
    val vs = math.pow(10, valueScale).toLong
    val ps = math.pow(10, priceScale).toLong
    // integral fixed-point representations — every sum below is exact
    val vInt = (valueCol.cast(s"decimal(18,$valueScale)") * vs).cast("decimal(38,0)")
    val wInt = weightCol.cast("decimal(38,0)")
    val pInt = (priceCol.cast(s"decimal(18,$priceScale)") * ps).cast("decimal(38,0)")
    df.groupBy(groupCols: _*).agg(
      round(sum(vInt * wInt).cast("double") / vs, 4).as("sum_rating_count_rating"),
      round(sum(wInt).cast("double"), 4).as("total_rating_count"),
      roundDiv4(sum(vInt * wInt), sum(wInt) * vs).as("average_rating"),
      roundDiv4(sum(pInt), count(priceCol) * ps).as("average_price"),
      count(lit(1)).as("book_count"))
  }
}
