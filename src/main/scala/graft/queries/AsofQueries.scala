package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Enrich
import graft.sources.Tables

/** As-of join + sketch/date operators.
  *
  * The as-of join (each left row matched to the most recent right row
  * at or before its timestamp) is the canonical "operator Spark
  * lacks"; the scalable formulation is UNION + SORT + LAST-non-null
  * WINDOW: tag both streams, union them, and carry the latest order
  * attributes forward within each key's time-ordered partition. One
  * shuffle on the key — no range join, no per-row probing — the same
  * shape Flink/kdb as-of implementations lower to. DuckDB has a
  * native ASOF JOIN, which is the oracle.
  */
object AsofQueries {

  /** events ASOF orders on (user_id = o_custkey, ts ≥ o_orderdate).
    * Orders are pre-deduped to one per (custkey, date) — max orderkey
    * wins — because as-of ties at equal timestamps are otherwise
    * engine-nondeterministic.
    */
  def joinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val ow = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val ordersD = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(ow)).filter(col("rn") === 1)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        col("o_orderkey"), col("o_totalprice"))
    val left = ordersD.select(col("k"), col("t"),
      col("o_orderkey"), col("o_totalprice"),
      lit(0).as("is_event"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
    val right = Tables.events(spark, sfDir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"),
      lit(1).as("is_event"), col("event_id"), col("value"))
    // at equal t, order rows (0) sort before event rows (1) → "≥" semantics
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1 && col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("k").as("user_id"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Same as-of semantics through the NATIVE whole-operator path:
    * [[graft.plans.AsofJoin]] logical node → [[graft.plans.AsofJoinExec]]
    * sort-merge as-of (one clustered shuffle per side, per-partition
    * streaming merge with O(1) state), planned via the injected
    * [[graft.plans.AsofJoinStrategy]]. Shares [[joinAsof]]'s DuckDB
    * ASOF JOIN oracle — two implementations, one truth.
    */
  def joinAsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ow = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val ordersD = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(ow)).filter(col("rn") === 1)
      // date → timestamp cast matches the implicit union-coercion in
      // [[joinAsof]] (and DuckDB's DATE-vs-TIMESTAMP comparison)
      .select(col("o_custkey").as("k"),
        col("o_orderdate").cast("timestamp").as("t"),
        col("o_orderkey"), col("o_totalprice"))
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.GraftPlans
      .asofJoin(events, ordersD, "user_id", "ts", "k", "t")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_totalprice").as("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  private val asofOracle =
    """WITH ordersD AS (
      |  SELECT o_custkey AS k, o_orderdate AS t, o_orderkey, o_totalprice
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |      ORDER BY o_orderkey DESC) AS rn
      |    FROM orders) WHERE rn = 1)
      |SELECT e.event_id, e.user_id,
      |  o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice
      |FROM events e ASOF JOIN ordersD o
      |  ON e.user_id = o.k AND e.ts >= o.t
      |ORDER BY e.event_id""".stripMargin

  /** HyperLogLog sketches: approximate distinct counts. The raw HLL
    * estimates are implementation-specific (no cross-engine SQL twin),
    * so the hash-checkable output is the EXACT counts plus
    * `within_5pct` booleans bounding the sketch error against them —
    * the oracle asserts TRUE, so a drifting estimate flips the hash
    * red rather than riding a weaker rows-only check (the last
    * `no_oracle` row through round 4). rsd=0.01 keeps the estimate
    * well inside the 5% envelope; HLL register-max merging is
    * order-independent, so the booleans are deterministic. AsofSpec
    * additionally pins the raw relative error.
    */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("approx_parts") - col("exact_parts")) * 20 <= col("exact_parts"))
          .as("parts_within_5pct"),
        (abs(col("approx_orders") - col("exact_orders")) * 20 <= col("exact_orders"))
          .as("orders_within_5pct"))
      .orderBy(col("l_returnflag"))

  private val approxDistinctOracle =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact companion of [[approxDistinct]]: the oracle-expressible
    * columns of the sketch query, fully hash-checked.
    */
  def approxDistinctExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy(col("l_returnflag"))

  private val approxExactOracle =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Date arithmetic: per-year order rollup + day-distance bounds. */
  def dateArith(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        round(Enrich.exactSum(col("o_totalprice")), 4).as("revenue"),
        max(datediff(lit("2002-01-01").cast("date"), col("o_orderdate")))
          .as("max_days_before_2002"))
      .orderBy(col("yr"))

  private val dateOracle =
    """SELECT year(o_orderdate) AS yr, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue,
      |  CAST(max(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS INT) AS max_days_before_2002
      |FROM orders GROUP BY yr ORDER BY yr""".stripMargin

  /** Range (band) join: events bucketed into value bands. The naive
    * form is a theta join (`value BETWEEN lo AND hi`) — a broadcast
    * nested loop. The scale form used here EQUI-joins on a computed
    * bucket key (`floor(value/width)`) and keeps the band predicate as
    * a residual filter, so it shuffles/broadcasts like any hash join;
    * for non-uniform bands the bucket key over-approximates and the
    * residual stays sound.
    */
  def joinRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val width = 5.0
    val bands = Seq(
      (0, 0.0, 5.0, "tiny"), (1, 5.0, 10.0, "small"),
      (2, 10.0, 15.0, "medium"), (3, 15.0, 20.0, "large"),
      (4, 20.0, 25.0, "huge"))
      .toDF("band_id", "lo", "hi", "label")
    val fact = Tables.events(spark, sfDir)
      .withColumn("band_id", floor(col("value") / width).cast("int"))
    fact.join(broadcast(bands), Seq("band_id"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_events"),
        round(Enrich.exactSum(col("value")), 4).as("value_sum"))
      .orderBy(col("label"))
  }

  private val rangeOracle =
    """SELECT label, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS value_sum
      |FROM events
      |JOIN (VALUES (0.0, 5.0, 'tiny'), (5.0, 10.0, 'small'),
      |             (10.0, 15.0, 'medium'), (15.0, 20.0, 'large'),
      |             (20.0, 25.0, 'huge')) AS b(lo, hi, label)
      |  ON value >= lo AND value < hi
      |GROUP BY label ORDER BY label""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("join_asof", Some(asofOracle), joinAsof),
    Q("join_asof_native", Some(asofOracle), joinAsofNative),
    Q("join_range", Some(rangeOracle), joinRange),
    Q("approx_distinct", Some(approxDistinctOracle), approxDistinct),
    Q("approx_distinct_exact", Some(approxExactOracle), approxDistinctExact),
    Q("date_arith", Some(dateOracle), dateArith),
  )
}
