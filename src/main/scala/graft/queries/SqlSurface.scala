package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Enrich
import graft.sources.Tables

/** The SQL-text + relational-completeness surface: raw `spark.sql`
  * over registered views (users of the reference who think in SQL can
  * drive this engine without the DataFrame API), multi-dimensional
  * aggregates, pivot, set operations, and non-parquet source formats.
  */
object SqlSurface {

  private def view(spark: SparkSession, sfDir: String, name: String): Unit =
    // events needs the ns→µs timestamp rebuild; the generic reader
    // would throw PARQUET_TYPE_ILLEGAL on its TIMESTAMP(NANOS) column
    (if (name == "events") Tables.events(spark, sfDir)
     else Tables(spark, sfDir, name)).createOrReplaceTempView(name)

  /** TPC-H Q3 shape written as RAW SQL text — the full parse → analyze
    * → optimize → execute path over registered views. Decimal-exact
    * revenue keeps it oracle-comparable.
    */
  def sqlTpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach(view(spark, sfDir, _))
    spark.sql(
      """SELECT l_orderkey,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS revenue,
        |  o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin)
  }

  private val q3Oracle =
    """SELECT l_orderkey,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS revenue,
      |  o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q5 shape as raw SQL: a 6-table star join (3 small dims, a
    * mid dim, two facts). At scale Catalyst broadcasts region/nation/
    * supplier and AQE picks join order from runtime stats — the plan
    * every warehouse engine must get right. Decimal-exact revenue,
    * rounded in DECIMAL space before the double cast (midpoint-safe).
    */
  def sqlTpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(view(spark, sfDir, _))
    spark.sql(
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  private val q5Oracle =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q1 (pricing summary report): one scan, one shuffle, 8
    * aggregates — the canonical partial+final aggregation benchmark.
    * Every sum is exact fixed-point decimal; the averages use
    * [[Enrich.roundDiv4]] integer arithmetic so the result is
    * bit-identical across engines (see SURVEY §7.4).
    */
  /** Q1's aggregate columns and the finest column set they reference,
    * exposed for [[ScaleQueries.mvRewriteQ1]]: the summary-table
    * registration derives its stored partials from THESE columns, so
    * registration and query are the same expressions by construction.
    * Grain = the group-bys plus the filter column — every non-aggregated
    * fact column the query touches.
    */
  private[graft] val q1Grain: Seq[String] =
    Seq("l_returnflag", "l_linestatus", "l_shipdate")

  private[graft] def q1Aggs: Seq[org.apache.spark.sql.Column] = {
    val qInt = (col("l_quantity").cast("decimal(18,4)") * 10000)
      .cast("decimal(38,0)")
    val pInt = (col("l_extendedprice").cast("decimal(18,4)") * 10000)
      .cast("decimal(38,0)")
    val dInt = (col("l_discount").cast("decimal(18,4)") * 10000)
      .cast("decimal(38,0)")
    val ep = col("l_extendedprice").cast("decimal(12,4)")
    val disc = col("l_discount").cast("decimal(12,4)")
    val tax = col("l_tax").cast("decimal(12,4)")
    Seq(
      round(Enrich.exactSum(col("l_quantity")), 4).as("sum_qty"),
      round(Enrich.exactSum(col("l_extendedprice")), 4).as("sum_base_price"),
      (round(sum(ep * (lit(1) - disc)), 4)).cast("double").as("sum_disc_price"),
      (round(sum(ep * (lit(1) - disc) * (lit(1) + tax)), 4)).cast("double").as("sum_charge"),
      Enrich.roundDiv4(sum(qInt), count(lit(1)) * 10000).as("avg_qty"),
      Enrich.roundDiv4(sum(pInt), count(lit(1)) * 10000).as("avg_price"),
      Enrich.roundDiv4(sum(dInt), count(lit(1)) * 10000).as("avg_disc"),
      count(lit(1)).as("count_order"))
  }

  def aggTpchQ1(spark: SparkSession, sfDir: String): DataFrame = {
    val aggs = q1Aggs
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private[graft] val q1Oracle = {
    def div4(n: String, d: String) = Enrich.roundDiv4Sql(n, d)
    s"""SELECT l_returnflag, l_linestatus,
       |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty,
       |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_base_price,
       |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
       |    (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_disc_price,
       |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
       |    (1 - CAST(l_discount AS DECIMAL(12,4))) *
       |    (1 + CAST(l_tax AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_charge,
       |  ${div4("sum(CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS HUGEINT))", "count(*) * 10000")} AS avg_qty,
       |  ${div4("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS HUGEINT))", "count(*) * 10000")} AS avg_price,
       |  ${div4("sum(CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS HUGEINT))", "count(*) * 10000")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** TPC-H Q6 (forecasting revenue change): the canonical
    * scan-filter-aggregate — no join, no group-by, one partial+final
    * agg to a single row. The point at scale: `.explain` shows all
    * three predicates as parquet PushedFilters, so row groups outside
    * the shipdate year never leave storage, and the whole query is a
    * single narrow codegen'd stage.
    */
  def sqlTpchQ6(spark: SparkSession, sfDir: String): DataFrame = {
    view(spark, sfDir, "lineitem")
    spark.sql(
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin)
  }

  private val q6Oracle =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    CAST(l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 (returned-item reporting): fact-to-fact join + two dims,
    * group by a high-cardinality customer key, top-20 by revenue. At
    * scale: nation broadcasts, customer⋈orders and orders⋈lineitem
    * shuffle on their keys, and the final TakeOrdered replaces a full
    * sort. Ties broken by c_custkey so the LIMIT is deterministic.
    */
  def sqlTpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation").foreach(view(spark, sfDir, _))
    spark.sql(
      """SELECT c_custkey, c_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue,
        |  n_name
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  private val q10Oracle =
    """SELECT c_custkey, c_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue,
      |  n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q4 shape (order-priority checking): correlated EXISTS
    * subquery — the decorrelation surface. Catalyst rewrites the
    * EXISTS into a LEFT SEMI join on l_orderkey, so at scale this is
    * one shuffle pair, not a per-row probe. (The reference schema has
    * no commit/receipt dates; the existence predicate is "has a
    * returned line", same plan class.)
    */
  def sqlTpchQ4(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders", "lineitem").foreach(view(spark, sfDir, _))
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  private val q4Oracle =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q14 shape (promotion effect): conditional aggregation over
    * a fact⋈dim join — promo revenue share as a ratio of two exact
    * DECIMAL sums, divided once in double and rounded (no per-row
    * float accumulation anywhere). At scale `part` broadcasts.
    */
  def sqlTpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach(view(spark, sfDir, _))
    spark.sql(
      """SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
        |         (1 - CAST(l_discount AS DECIMAL(12,4)))
        |    ELSE CAST(0 AS DECIMAL(16,8)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE), 4) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)
  }

  private val q14Oracle =
    """SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
      |         (1 - CAST(l_discount AS DECIMAL(12,4)))
      |    ELSE CAST(0 AS DECIMAL(16,8)) END) AS DOUBLE) /
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE), 4) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): IN subquery over a
    * grouped HAVING — the second correlated-subquery class next to
    * Q4's EXISTS. Catalyst plans the IN as a left-semi join against
    * the pre-aggregated subquery, so the fact table is aggregated
    * once and probed once.
    */
  def sqlTpchQ18(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach(view(spark, sfDir, _))
    spark.sql(
      """SELECT c_custkey, o_orderkey,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 210)
        |GROUP BY c_custkey, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 25""".stripMargin)
  }

  private val q18Oracle =
    """SELECT c_custkey, o_orderkey,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 210)
      |GROUP BY c_custkey, o_orderkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 25""".stripMargin

  /** TPC-H Q7 (volume shipping): the two-sided dimension filter — the
    * same `nation` table joins twice under different roles (supplier's
    * vs customer's nation), with a symmetric disjunction over the pair.
    * At scale both nation replicas broadcast and the fact chain
    * shuffles once per key; the year() projection is pre-aggregation,
    * so the group-by keys are tiny.
    */
  def sqlTpchQ7(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "customer", "nation")
      .foreach(view(spark, sfDir, _))
    spark.sql(q7Sql)
  }

  private val q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(round(sum(vol), 4) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(12,4)) *
      |      (1 - CAST(l_discount AS DECIMAL(12,4))) AS vol
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 (national market share): conditional share-of-total over
    * an 8-table star join — numerator and denominator as two exact
    * DECIMAL sums in ONE aggregation pass, divided once in double.
    * (`lineitem` is the part↔supplier bridge; the reduced schema has
    * no partsupp.)
    */
  def sqlTpchQ8(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
      .foreach(view(spark, sfDir, _))
    spark.sql(q8Sql)
  }

  private val q8Sql =
    """SELECT o_year,
      |  round(CAST(sum(CASE WHEN nation = 'NATION_3'
      |      THEN vol ELSE CAST(0 AS DECIMAL(16,8)) END) AS DOUBLE) /
      |    CAST(sum(vol) AS DOUBLE), 4) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,4)) *
      |      (1 - CAST(l_discount AS DECIMAL(12,4))) AS vol,
      |    n1.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region   ON n2.n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |) all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q13 (customer distribution): LEFT OUTER join with an
    * ON-clause filter on the null-producing side (semantics a WHERE
    * cannot express), then a second aggregation over the first —
    * customers per order-count bucket, including the zero bucket.
    */
  def sqlTpchQ13(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders").foreach(view(spark, sfDir, _))
    spark.sql(q13Sql)
  }

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q19 (discounted revenue): a 3-way disjunction of conjunct
    * bands over both join sides. Catalyst extracts the common
    * `p_partkey = l_partkey` equi-key, pushes the part-only and
    * lineitem-only predicate unions down to the scans, and leaves the
    * cross-band residual on the join — disjunctions don't defeat
    * pushdown.
    */
  def sqlTpchQ19(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach(view(spark, sfDir, _))
    spark.sql(q19Sql)
  }

  private val q19Sql =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    (1 - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 21)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 30)
      |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 40)""".stripMargin

  /** TPC-H Q22 (global sales opportunity): scalar aggregate subquery
    * feeding a per-row predicate + NOT EXISTS anti-join. The
    * above-average test is exact — `bal·cnt > total` in DECIMAL
    * integer arithmetic instead of comparing against a float mean, so
    * boundary rows can't flip between engines. At scale the scalar
    * subquery is one tiny broadcast and the anti-join shuffles on
    * custkey.
    */
  def sqlTpchQ22(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders").foreach(view(spark, sfDir, _))
    spark.sql(q22Sql)
  }

  private val q22Sql =
    """WITH s AS (
      |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS tot, count(*) AS cnt
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_nationkey, count(*) AS numcust,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS totacctbal
      |FROM customer, s
      |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * cnt > tot
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q2 (minimum-cost supplier): the correlated scalar-MIN
    * subquery over a 5-table join, repeated inside and outside the
    * correlation — the decorrelation stress test. The reduced schema
    * has no partsupp, so the part↔supplier relationship is the
    * distinct (l_partkey, l_suppkey) pairs in lineitem and the "cost"
    * is the supplier's account balance; the plan class (aggregate
    * decorrelated to a join on p_partkey, dims broadcast, DISTINCT to
    * collapse the bridge) is exactly Q2's. Equality on s_acctbal is
    * pure comparison — no float arithmetic — so it's engine-stable.
    */
  def sqlTpchQ2(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "nation", "region")
      .foreach(view(spark, sfDir, _))
    spark.sql(q2Sql)
  }

  private val q2Sql =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE p_size = 25 AND p_type = 'LARGE' AND r_name = 'ASIA'
      |  AND s_acctbal = (
      |    SELECT min(s2.s_acctbal)
      |    FROM lineitem l2
      |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      |    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
      |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q9 (product-type profit): profit = revenue − cost as exact
    * DECIMAL subtraction per line, aggregated by (nation, year). With
    * no partsupp, cost is p_retailprice·l_quantity — same expression
    * class as ps_supplycost·l_quantity. The LIKE filter on p_name is
    * non-sargable-prefix (contains), which must still reach the part
    * scan as a pushed filter; nation broadcasts, the fact chain
    * shuffles on its join keys once each.
    */
  def sqlTpchQ9(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "nation")
      .foreach(view(spark, sfDir, _))
    spark.sql(q9Sql)
  }

  private val q9Sql =
    """SELECT nation, o_year,
      |  CAST(round(sum(amount), 4) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,4)) *
      |      (1 - CAST(l_discount AS DECIMAL(12,4))) -
      |    CAST(p_retailprice AS DECIMAL(12,4)) *
      |      CAST(l_quantity AS DECIMAL(12,4)) AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 (important stock): grouped value vs a FRACTION of the
    * global total — the same aggregate computed per-group and globally,
    * compared in exact DECIMAL (value·1000 > total, no float fraction).
    * The inventory value per part is Σ price·qty over the lines shipped
    * by one nation's suppliers. At scale the CTE aggregates once; the
    * scalar total is a one-row broadcast reused from the same shuffle
    * (exchange reuse), not a second scan.
    */
  def sqlTpchQ11(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem", "nation").foreach(view(spark, sfDir, _))
    spark.sql(q11Sql)
  }

  private val q11Sql =
    """WITH val AS (
      |  SELECT l_partkey AS partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |        CAST(l_quantity AS DECIMAL(12,4))) AS value
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7'
      |  GROUP BY l_partkey)
      |SELECT partkey, CAST(round(value, 4) AS DOUBLE) AS value
      |FROM val
      |WHERE value * 1000 > (SELECT sum(value) FROM val)
      |ORDER BY value DESC, partkey""".stripMargin

  /** TPC-H Q16 (supplier-part relationships): COUNT(DISTINCT) per
    * 3-column group + a null-safe NOT IN exclusion subquery (planned as
    * a null-aware anti join). Complaint suppliers become
    * negative-balance suppliers in the reduced schema. The distinct
    * count forces a two-phase aggregate (dedup shuffle on the full key,
    * then count) — the expensive-but-correct plan every engine must
    * produce here.
    */
  def sqlTpchQ16(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem").foreach(view(spark, sfDir, _))
    spark.sql(q16Sql)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 (part promotion candidates): nested IN subqueries — a
    * grouped-HAVING inner query (suppliers who moved > 50 units of any
    * red part in 1996) whose keys feed an outer IN against the
    * supplier dim. Catalyst plans both INs as left-semi joins; the
    * grouped subquery aggregates lineitem once on (suppkey, partkey).
    */
  def sqlTpchQ20(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "nation").foreach(view(spark, sfDir, _))
    spark.sql(q20Sql)
  }

  private val q20Sql =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (
      |        SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 50)
      |ORDER BY s_name""".stripMargin

  /** TPC-H Q21 (suppliers who kept orders waiting): the double
    * correlated EXISTS / NOT EXISTS self-join on the fact table — the
    * hardest decorrelation in the suite. "Late" is a returned line in
    * the reduced schema: supplier S is blamed for a finished order iff
    * S returned a line, another supplier participated, and no OTHER
    * supplier returned one. Catalyst turns the pair into a left-semi
    * and a left-anti join against the same lineitem scan.
    */
  def sqlTpchQ21(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "nation").foreach(view(spark, sfDir, _))
    spark.sql(q21Sql)
  }

  private val q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders   ON o_orderkey = l1.l_orderkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** ROLLUP: per-(returnflag, linestatus) subtotals + per-flag + grand
    * total in one pass — the multi-dimensional aggregate class the
    * reference can't express at all.
    */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(Enrich.exactSum(col("l_quantity")), 4).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val rollupOracle =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Pivot: quantities per (linestatus × returnflag-as-columns). The
    * oracle expresses the same reshape as conditional aggregates —
    * which is also exactly what Catalyst lowers pivot to.
    */
  def pivotFlags(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(Enrich.exactSum(col("l_quantity")), 4))
      .orderBy(col("l_linestatus"))

  private val pivotOracle =
    """SELECT l_linestatus,
      |  round(CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE), 4) AS A,
      |  round(CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE), 4) AS N,
      |  round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE), 4) AS R
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Explicit GROUPING SETS with grouping_id — the general form of
    * ROLLUP/CUBE (`rollup_agg`/`cube_agg` are its two fixed shapes):
    * an arbitrary set list, including the grand total, in one pass.
    * Catalyst expands the sets into one Expand + single aggregate —
    * one shuffle regardless of how many sets.
    */
  def aggGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    view(spark, sfDir, "lineitem")
    spark.sql(groupingSetsSql)
  }

  private val groupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      |  grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
      |  count(*) AS n_lines,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** LATERAL correlated subquery join (Spark 4): for each nation, the
    * top-2 customers by balance via a correlated ordered-limit
    * subquery — the "per-row top-k probe" SQL surface. Catalyst
    * decorrelates the LATERAL into a ranked window join, so at scale
    * this is the same one-shuffle plan as `window_rank_topn`, not a
    * per-nation query loop.
    */
  def joinLateral(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("nation", "customer").foreach(view(spark, sfDir, _))
    spark.sql(lateralSql)
  }

  private val lateralSql =
    """SELECT n_name, c.c_custkey, c.c_acctbal
      |FROM nation,
      |LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey
      |  LIMIT 2) c
      |ORDER BY n_name, c.c_acctbal DESC, c.c_custkey""".stripMargin

  /** EXCEPT ALL / INTERSECT ALL: the multiset set-ops (`setops_chain`
    * covers the DISTINCT forms). Bag semantics keep duplicate
    * multiplicities — Catalyst plans them as counted anti/semi
    * aggregations, not row-level joins.
    */
  def setOpsAll(spark: SparkSession, sfDir: String): DataFrame = {
    view(spark, sfDir, "lineitem")
    spark.sql(setOpsAllSql)
  }

  private val setOpsAllSql =
    """SELECT l_orderkey FROM (
      |  (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |   EXCEPT ALL
      |   SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F' AND l_returnflag = 'R')
      |  INTERSECT ALL
      |  SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      |ORDER BY l_orderkey""".stripMargin

  /** Set operations: customers in BUILDING-segment minus big-balance,
    * unioned with a disjoint slice, intersected with nation-filtered —
    * UNION/INTERSECT/EXCEPT in one plan.
    */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val lowNation = c.filter(col("c_nationkey") < 13).select(col("c_custkey"))
    building.except(rich).union(auto).intersect(lowNation)
      .orderBy(col("c_custkey"))
  }

  private val setOpsOracle =
    """SELECT c_custkey FROM (
      |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |   EXCEPT
      |   SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |  UNION ALL
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |)
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_nationkey < 13
      |ORDER BY c_custkey""".stripMargin

  /** JSON-lines source roundtrip: parquet → json write → schema'd json
    * read → aggregate. The engine reads/writes more than parquet.
    */
  def sourceJsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_src_json"
    Tables.nation(spark, sfDir).write.mode("overwrite").json(path)
    val back = spark.read.schema(Tables.nation(spark, sfDir).schema).json(path)
    back.groupBy(col("n_regionkey")).agg(count(lit(1)).as("n_nations"))
      .orderBy(col("n_regionkey"))
  }

  private val jsonOracle =
    """SELECT n_regionkey, count(*) AS n_nations
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** TPC-H Q12 shape (shipping-mode priority split, adapted — the
    * reduced schema has no shipmode, so the split key is linestatus):
    * conditional counts over a fact⋈fact join, both CASE sums in one
    * aggregation pass.
    */
  def sqlTpchQ12(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders", "lineitem").foreach(view(spark, sfDir, _))
    spark.sql(q12Sql)
  }

  private val q12Sql =
    """SELECT l_linestatus,
      |  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
      |    AS high_line_count,
      |  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
      |    AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q15 shape (top supplier): a revenue CTE consumed twice —
    * once aggregated to its global max (tiny broadcast), once joined
    * back on equality with that max. With spark.sql.exchangeReuse the
    * CTE's shuffle is computed once and reused.
    */
  def sqlTpchQ15(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("supplier", "lineitem").foreach(view(spark, sfDir, _))
    spark.sql(q15Sql)
  }

  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |        (1 - CAST(l_discount AS DECIMAL(12,4)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  CAST(round(total_revenue, 4) AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): CORRELATED scalar
    * aggregate subqueries — the decorrelation class next to Q4's
    * EXISTS and Q18's IN. The avg-quantity threshold is exactified to
    * integer/decimal arithmetic (`5·qty·cnt < sum` ⟺
    * `qty < 0.2·avg`), so no float mean can flip a boundary row
    * between engines. Catalyst rewrites both subqueries into one
    * aggregate join on l_partkey.
    */
  def sqlTpchQ17(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("lineitem", "part").foreach(view(spark, sfDir, _))
    spark.sql(q17Sql)
  }

  private val q17Sql =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
      |  / 7.0, 4) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND CAST(l_quantity AS DECIMAL(18,4)) * 5 *
      |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |    < (SELECT sum(CAST(l_quantity AS DECIMAL(18,4)))
      |       FROM lineitem l3 WHERE l3.l_partkey = p_partkey)""".stripMargin

  /** Semi-structured VARIANT path (Spark 4): `parse_json` → open
    * VARIANT column → typed `variant_get` extraction. Unlike
    * `from_json` (fixed schema up front) the variant is
    * schema-on-read — the shape a 100 TB event firehose actually has.
    * Extraction stays columnar (shredded binary encoding, no JSON
    * re-parse per access). The oracle runs DuckDB's JSON type over
    * the same documents.
    */
  def variantExtract(spark: SparkSession, sfDir: String): DataFrame = {
    // events needs the ns→µs timestamp rebuild — not the generic view()
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    spark.sql(
      """SELECT event_type,
        |  count(*) AS n_events,
        |  sum(variant_get(parse_json(props), '$.k', 'int')) AS k_sum,
        |  min(variant_get(parse_json(props), '$.k', 'int')) AS k_min,
        |  max(variant_get(parse_json(props), '$.k', 'int')) AS k_max
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  private val variantOracle =
    """SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
      |  CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_min,
      |  CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_max
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE): sessionization as a
    * transitive closure — each event chains to its user's previous
    * event when the gap is ≤ 5 minutes, and the recursion walks every
    * chain back to its head (the event whose own predecessor link is
    * null). The session label is that TERMINAL ancestor — not
    * min(event_id), which would be wrong whenever ids aren't aligned
    * with time order. Spark's recursion supports UNION ALL only; the
    * predecessor edges strictly decrease in event time, so walks are
    * finite and duplicate-free without a distinct. Same semantics
    * class as `window_session` (running gap sum), expressed as graph
    * reachability; the oracle is the identical query with DuckDB's
    * epoch_us spelling.
    */
  def sqlRecursiveSession(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    spark.sql(recursiveSessionSql("unix_micros(ts)"))
  }

  private def recursiveSessionSql(us: String) =
    s"""WITH RECURSIVE
       |g AS (
       |  SELECT event_id AS id,
       |    lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
       |    $us - lag($us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
       |  FROM events),
       |m AS (
       |  SELECT id, CASE WHEN gap <= 300000000 THEN prev_id END AS prev FROM g),
       |reach(src, dst) AS (
       |  SELECT id AS src, prev AS dst FROM m WHERE prev IS NOT NULL
       |  UNION ALL
       |  SELECT r.src, m2.prev FROM reach r
       |  JOIN m m2 ON r.dst = m2.id AND m2.prev IS NOT NULL)
       |SELECT m.id,
       |  coalesce(min(CASE WHEN head.prev IS NULL THEN r.dst END), m.id) AS session_head
       |FROM m
       |LEFT JOIN reach r ON m.id = r.src
       |LEFT JOIN m head ON r.dst = head.id
       |GROUP BY m.id ORDER BY m.id""".stripMargin

  /** ORC source roundtrip — the third columnar container next to
    * parquet and the text formats; same pushdown/pruning machinery
    * applies (`spark.sql.orc.filterPushdown` is on by default).
    */
  def sourceOrcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_src_orc"
    Tables.supplier(spark, sfDir).write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .filter(col("s_acctbal") > 0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(Enrich.exactSum(col("s_acctbal")), 4).as("bal_total"))
      .orderBy(col("s_nationkey"))
  }

  private val orcOracle =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |  round(CAST(sum(CAST(s_acctbal AS DECIMAL(28,4))) AS DOUBLE), 4) AS bal_total
      |FROM supplier WHERE s_acctbal > 0
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Parquet schema evolution: two batches written with DIFFERENT
    * schemas (a column added mid-stream — the normal life of a 100 TB
    * table), read back as ONE table via `mergeSchema`; rows from the
    * old batch surface the new column as null. The oracle reproduces
    * the evolution with a CASE over the batch-split key.
    */
  def sourceSchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_src_evolve"
    val n = Tables.nation(spark, sfDir)
    n.filter(col("n_nationkey") < 13)
      .select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$path/batch=1")
    n.filter(col("n_nationkey") >= 13)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").parquet(s"$path/batch=2")
    spark.read.option("mergeSchema", "true").parquet(path)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  private val schemaEvolutionOracle =
    """SELECT n_nationkey, n_name,
      |  CASE WHEN n_nationkey >= 13 THEN n_regionkey END AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Corrupt-record tolerance: PERMISSIVE JSON parsing with a
    * `_corrupt_record` capture column — the engine-native form of the
    * reference's per-row try/except skip (`dags/dag.py` catches parse
    * failures and drops the row). A deterministic fixture interleaves
    * malformed lines with the nation table; the query routes bad rows
    * to a quarantine count instead of failing the job (FAILFAST) or
    * silently losing them (DROPMALFORMED) — all three modes exercised
    * in SourceModesSpec over the same fixture. At
    * 100 TB malformed input is a certainty, not an edge case, and the
    * quarantine count is the data-quality metric a pipeline alerts on.
    */
  def sourceCorruptRecords(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_src_corrupt"
    Tables.nation(spark, sfDir).write.mode("overwrite").json(path)
    // 3 malformed lines dropped next to the good part-files
    Files.writeString(Paths.get(s"$path/garbage.json"),
      "{\"n_nationkey\": oops}\nnot json at all\n{\"n_nationkey\": 1,\n")
    val schema = "n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt_record STRING"
    val back = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    back.agg(
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        count(col("_corrupt_record")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("n_regionkey")))
          .as("region_sum"))
  }

  private val corruptOracle =
    """SELECT count(*) AS n_good, CAST(3 AS BIGINT) AS n_corrupt,
      |  CAST(sum(n_regionkey) AS BIGINT) AS region_sum
      |FROM nation""".stripMargin

  /** XML source roundtrip (Spark 4 native XML datasource): customer
    * written as `<customer>` row elements, read back with an explicit
    * schema, aggregated. The closest engine-native analog of the
    * reference's actual input surface — HTML/markup records parsed
    * into a DataFrame (`dags/dag.py` BeautifulSoup extraction);
    * `extract_markup` covers the regex-over-tag-soup form, this
    * covers well-formed markup as a first-class source with the same
    * pushdown/pruning machinery as any file format.
    */
  def sourceXmlRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_src_xml"
    val cust = Tables.customer(spark, sfDir)
    cust.write.mode("overwrite").option("rowTag", "customer")
      .format("xml").save(path)
    spark.read.schema(cust.schema).option("rowTag", "customer")
      .format("xml").load(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(Enrich.exactSum(col("c_acctbal")), 4).as("bal_total"))
      .orderBy(col("c_mktsegment"))
  }

  private val xmlOracle =
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE), 4) AS bal_total
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** CSV source roundtrip with explicit schema + header. */
  def sourceCsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_src_csv"
    Tables.region(spark, sfDir).write.mode("overwrite")
      .option("header", "true").csv(path)
    val back = spark.read.schema(Tables.region(spark, sfDir).schema)
      .option("header", "true").csv(path)
    back.select(col("r_regionkey"), col("r_name")).orderBy(col("r_regionkey"))
  }

  private val csvOracle =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"

  /** Relational division ("for all" queries — Codd's ÷, the classic
    * pattern every SQL surface should express): customers whose orders
    * span EVERY existing order-priority class. Expressed as the
    * count-matching form — per-customer COUNT(DISTINCT priority)
    * equals the global distinct count (scalar subquery → 1-row
    * broadcast) — which is one aggregation instead of the textbook
    * double-NOT-EXISTS (two correlated anti-joins); both decorrelate,
    * but the count form keeps a single shuffle on the division key.
    */
  def sqlRelationalDivision(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("orders").foreach(view(spark, sfDir, _))
    spark.sql(
      """SELECT o_custkey AS custkey, count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(DISTINCT o_orderpriority) =
        |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
        |ORDER BY custkey""".stripMargin)
  }

  private val divisionOracle =
    """SELECT o_custkey AS custkey, count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(DISTINCT o_orderpriority) =
      |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
      |ORDER BY custkey""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("sql_relational_division", Some(divisionOracle), sqlRelationalDivision),
    Q("sql_tpch_q3", Some(q3Oracle), sqlTpchQ3),
    Q("sql_tpch_q5", Some(q5Oracle), sqlTpchQ5),
    Q("sql_tpch_q4", Some(q4Oracle), sqlTpchQ4),
    Q("sql_tpch_q6", Some(q6Oracle), sqlTpchQ6),
    Q("sql_tpch_q10", Some(q10Oracle), sqlTpchQ10),
    Q("sql_tpch_q14", Some(q14Oracle), sqlTpchQ14),
    Q("sql_tpch_q18", Some(q18Oracle), sqlTpchQ18),
    Q("sql_tpch_q7", Some(q7Sql), sqlTpchQ7),
    Q("sql_tpch_q8", Some(q8Sql), sqlTpchQ8),
    Q("sql_tpch_q13", Some(q13Sql), sqlTpchQ13),
    Q("sql_tpch_q19", Some(q19Sql), sqlTpchQ19),
    Q("sql_tpch_q22", Some(q22Sql), sqlTpchQ22),
    Q("sql_tpch_q12", Some(q12Sql), sqlTpchQ12),
    Q("sql_tpch_q15", Some(q15Sql), sqlTpchQ15),
    Q("sql_tpch_q17", Some(q17Sql), sqlTpchQ17),
    Q("sql_tpch_q2", Some(q2Sql), sqlTpchQ2),
    Q("sql_tpch_q9", Some(q9Sql), sqlTpchQ9),
    Q("sql_tpch_q11", Some(q11Sql), sqlTpchQ11),
    Q("sql_tpch_q16", Some(q16Sql), sqlTpchQ16),
    Q("sql_tpch_q20", Some(q20Sql), sqlTpchQ20),
    Q("sql_tpch_q21", Some(q21Sql), sqlTpchQ21),
    Q("agg_tpch_q1", Some(q1Oracle), aggTpchQ1),
    Q("rollup_agg", Some(rollupOracle), rollupAgg),
    Q("agg_grouping_sets", Some(groupingSetsSql), aggGroupingSets),
    Q("join_lateral", Some(lateralSql), joinLateral),
    Q("setops_all", Some(setOpsAllSql), setOpsAll),
    Q("pivot_flags", Some(pivotOracle), pivotFlags),
    Q("setops_chain", Some(setOpsOracle), setOps),
    Q("source_json_roundtrip", Some(jsonOracle), sourceJsonRoundtrip),
    Q("source_csv_roundtrip", Some(csvOracle), sourceCsvRoundtrip),
    Q("source_corrupt_records", Some(corruptOracle), sourceCorruptRecords),
    Q("source_xml_roundtrip", Some(xmlOracle), sourceXmlRoundtrip),
    Q("source_schema_evolution", Some(schemaEvolutionOracle), sourceSchemaEvolution),
    Q("source_orc_roundtrip", Some(orcOracle), sourceOrcRoundtrip),
    Q("variant_extract", Some(variantOracle), variantExtract),
    Q("sql_recursive_session", Some(recursiveSessionSql("epoch_us(ts)")), sqlRecursiveSession),
  )
}
