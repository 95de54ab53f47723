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
    Tables(spark, sfDir, name).createOrReplaceTempView(name)

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

  def queries: Seq[Q] = Seq(
    Q("sql_tpch_q3", Some(q3Oracle), sqlTpchQ3),
    Q("rollup_agg", Some(rollupOracle), rollupAgg),
    Q("pivot_flags", Some(pivotOracle), pivotFlags),
    Q("setops_chain", Some(setOpsOracle), setOps),
    Q("source_json_roundtrip", Some(jsonOracle), sourceJsonRoundtrip),
    Q("source_csv_roundtrip", Some(csvOracle), sourceCsvRoundtrip),
  )
}
