package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Enrich, Standardise}
import graft.sources.Tables

/** Reference-surface queries — one per operator row of SURVEY.md §2,
  * each with a DuckDB oracle over the same tables.
  *
  * Role mapping (FIXTURES.md): `lineitem` plays the scraped `books`
  * table, `supplier` plays `author`. The "dirty books" queries REBUILD
  * the reference's raw scrape shape (whitespace, "4.5 out of 5 stars",
  * "1,234" counts — `/root/reference/dags/dag.py:95-146`) from lineitem
  * columns with integer-only arithmetic so Spark and DuckDB produce
  * byte-identical strings, then clean them with the §2.2 operators.
  */
object RefSurface {

  /** Flagship: the reference's enrich stage (`dag.py:153-184`) as ONE
    * aggregation pass + broadcast dimension joins, instead of pandas'
    * 4 group-bys + 3 merges. Aggregates BEFORE joining so the join
    * input is |suppliers|, not |lineitem| — at 100 TB the fact table
    * never reaches a join.
    */
  def flagshipEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val metrics = Enrich.metrics(
      li, Seq(col("l_suppkey")),
      valueCol = col("l_extendedprice"), valueScale = 2,
      weightCol = col("l_quantity"), priceCol = col("l_extendedprice"))
    metrics
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(
        col("s_name").as("supplier_name"),
        col("n_name").as("nation_name"),
        col("average_rating").as("weighted_avg_price"),
        col("average_price"),
        col("total_rating_count").as("total_quantity"),
        col("book_count").as("line_count"))
      .orderBy(col("supplier_name"))
  }

  // All float aggregates in the oracles below run their SUMs in DECIMAL
  // (exact, summation-order-independent) and cast to DOUBLE only at the
  // end — mirroring Enrich.exactSum — so Spark's and DuckDB's different
  // reduction orders cannot flip a round(_, 4) boundary digit.
  // lineitem fixed-point views used by the oracles: extendedprice is
  // exact at 2 decimals (cents), quantity is integral.
  private val epCents = "CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)"
  private val qtyInt  = "CAST(l_quantity AS BIGINT)"

  private val flagshipOracle =
    s"""SELECT s_name AS supplier_name, n_name AS nation_name,
       |  ${Enrich.roundDiv4Sql(s"sum($epCents * $qtyInt)", s"100*sum($qtyInt)")} AS weighted_avg_price,
       |  ${Enrich.roundDiv4Sql(s"sum($epCents)", "100*count(l_extendedprice)")} AS average_price,
       |  round(CAST(sum($qtyInt) AS DOUBLE), 4) AS total_quantity,
       |  count(*) AS line_count
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY s_name, n_name
       |ORDER BY supplier_name""".stripMargin

  /** The raw "books" frame (SURVEY §2.1 S5): lineitem re-skinned as the
    * reference's post-scrape all-string records, dirty on purpose.
    * Integer-only string construction ⇒ engine-portable.
    */
  def rawBooks(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = floor(col("l_extendedprice") * 100).cast("long")
    val rc = col("l_orderkey") % 5000
    Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_linenumber"),
      concat(lit("  B-"), (col("l_orderkey") % 997).cast("string"),
        lit("-"), col("l_returnflag"), lit("  ")).as("title"),
      concat(lit("A-"), (col("l_suppkey") % 211).cast("string")).as("author"),
      when(col("l_returnflag") === "A", "Hardcover")
        .when(col("l_returnflag") === "N", "Paperback")
        .otherwise("Kindle").as("book_type"),
      concat((cents / 100).cast("long").cast("string"), lit("."),
        lpad((cents % 100).cast("string"), 2, "0")).as("price"),
      when(col("l_partkey") % 7 === 0, lit("not rated"))
        .otherwise(concat((lit(1) + col("l_partkey") % 4).cast("string"),
          lit("."), (col("l_partkey") % 10).cast("string"),
          lit(" out of 5 stars"))).as("rating"),
      when(rc >= 1000,
        concat((rc / 1000).cast("long").cast("string"), lit(","),
          lpad((rc % 1000).cast("string"), 3, "0")))
        .otherwise(rc.cast("string")).as("rating_count"))
  }

  /** Same construction in DuckDB SQL (shared CTE for the oracles). */
  private val rawBooksSql =
    """WITH raw_books AS (
      |  SELECT l_orderkey, l_linenumber,
      |    '  B-' || CAST(l_orderkey % 997 AS VARCHAR) || '-' || l_returnflag || '  ' AS title,
      |    'A-' || CAST(l_suppkey % 211 AS VARCHAR) AS author,
      |    CASE l_returnflag WHEN 'A' THEN 'Hardcover'
      |      WHEN 'N' THEN 'Paperback' ELSE 'Kindle' END AS book_type,
      |    CAST(CAST(floor(l_extendedprice*100) AS BIGINT) // 100 AS VARCHAR) || '.' ||
      |      lpad(CAST(CAST(floor(l_extendedprice*100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS price,
      |    CASE WHEN l_partkey % 7 = 0 THEN 'not rated'
      |      ELSE CAST(1 + l_partkey % 4 AS VARCHAR) || '.' ||
      |        CAST(l_partkey % 10 AS VARCHAR) || ' out of 5 stars' END AS rating,
      |    CASE WHEN l_orderkey % 5000 >= 1000
      |      THEN CAST((l_orderkey % 5000) // 1000 AS VARCHAR) || ',' ||
      |        lpad(CAST((l_orderkey % 5000) % 1000 AS VARCHAR), 3, '0')
      |      ELSE CAST(l_orderkey % 5000 AS VARCHAR) END AS rating_count
      |  FROM lineitem
      |)""".stripMargin

  /** SURVEY §2.2 P2-P7 + §2.1 S3/S4 in one stage: trim, deterministic
    * first-wins dedup on title, price/rating/count parses.
    */
  def standardiseBooks(spark: SparkSession, sfDir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    // the tie-break orders by every column that reaches the output —
    // any rows still tied are output-identical, keeping the dedup
    // deterministic across engines.
    val raw = rawBooks(spark, sfDir)
      .withColumn("title", Standardise.trimmed(col("title")))
    // name-based dedupFirst (round 16): packs each column once — the
    // min-struct carries 7 fields instead of 14 (the Column overload
    // duplicated the 6 order columns into the payload tail and packed
    // the group-constant key)
    Standardise.dedupFirst(raw,
        key = Seq("title"),
        order = Seq("l_orderkey", "l_linenumber",
          "author", "book_type", "price", "rating"))
      .select(
        col("title"), col("author"), col("book_type"),
        Standardise.parsePrice(col("price")).as("price"),
        Standardise.extractRating(col("rating")).as("rating"),
        Standardise.parseCount(col("rating_count")).as("rating_count"))
      .orderBy(col("title"))
  }

  private val standardiseOracle = rawBooksSql +
    """
      |SELECT title, author, book_type,
      |  CAST(price AS DOUBLE) AS price,
      |  CAST(NULLIF(regexp_extract(rating, '(\d\.\d)', 1), '') AS DOUBLE) AS rating,
      |  CAST(replace(rating_count, ',', '') AS INT) AS rating_count
      |FROM (
      |  SELECT trim(title) AS title, author, book_type, price, rating, rating_count,
      |    row_number() OVER (PARTITION BY trim(title)
      |      ORDER BY l_orderkey, l_linenumber, author, book_type, price, rating) AS rn
      |  FROM raw_books
      |) WHERE rn = 1
      |ORDER BY title""".stripMargin

  /** Enrich over the standardised books — the full reference pipeline
    * (extract-shape → standardise → enrich) end-to-end, grouped by
    * author (`dag.py:167-182`).
    */
  def enrichBooks(spark: SparkSession, sfDir: String): DataFrame =
    Enrich.metrics(
      standardiseBooks(spark, sfDir).filter(col("rating").isNotNull),
      Seq(col("author")),
      valueCol = col("rating"), valueScale = 1,
      weightCol = col("rating_count"), priceCol = col("price"))
      .orderBy(col("author"))

  private val enrichOracle = rawBooksSql +
    """, books AS (
      |  SELECT title, author, book_type,
      |    CAST(price AS DOUBLE) AS price,
      |    CAST(NULLIF(regexp_extract(rating, '(\d\.\d)', 1), '') AS DOUBLE) AS rating,
      |    CAST(replace(rating_count, ',', '') AS INT) AS rating_count
      |  FROM (
      |    SELECT trim(title) AS title, author, book_type, price, rating, rating_count,
      |      row_number() OVER (PARTITION BY trim(title)
      |        ORDER BY l_orderkey, l_linenumber, author, book_type, price, rating) AS rn
      |    FROM raw_books
      |  ) WHERE rn = 1
      |)
      |SELECT author,
      |  round(CAST(sum(CAST(CAST(rating AS DECIMAL(18,1))*10 AS BIGINT) * CAST(rating_count AS BIGINT)) AS DOUBLE)/10, 4) AS sum_rating_count_rating,
      |  round(CAST(sum(CAST(rating_count AS BIGINT)) AS DOUBLE), 4) AS total_rating_count,
      |  """.stripMargin +
    Enrich.roundDiv4Sql(
      "sum(CAST(CAST(rating AS DECIMAL(18,1))*10 AS BIGINT) * CAST(rating_count AS BIGINT))",
      "10*sum(CAST(rating_count AS BIGINT))") +
    """ AS average_rating,
      |  """.stripMargin +
    Enrich.roundDiv4Sql(
      "sum(CAST(CAST(price AS DECIMAL(18,2))*100 AS BIGINT))", "100*count(price)") +
    """ AS average_price,
      |  count(*) AS book_count
      |FROM books WHERE rating IS NOT NULL
      |GROUP BY author
      |ORDER BY author""".stripMargin

  /** S4: dedup + deterministic limit. First lineitem per part by ship
    * date (ties: orderkey, linenumber), first 50 parts.
    */
  def dedupLimit(spark: SparkSession, sfDir: String): DataFrame =
    // project BEFORE the dedup (round 16, guide §2.3 "project before
    // the exchange"): only 5 of lineitem's 16 columns reach the
    // output or the ordering, but the min-struct aggregate is opaque
    // to column pruning — the former shape read and shuffled all 16
    // (comment strings included). The row set is unchanged: rows tied
    // on all 4 order columns are identical on every projected column,
    // so the emitted row is the same whichever physical row carried
    // it (the dropped columns only ever broke ties among
    // output-identical rows).
    Standardise.dedupFirst(
        Tables.lineitem(spark, sfDir).select(
          "l_partkey", "l_shipdate", "l_orderkey", "l_linenumber",
          "l_quantity"),
        key = Seq("l_partkey"),
        order = Seq("l_shipdate", "l_orderkey", "l_linenumber",
          "l_quantity"))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .orderBy(col("l_partkey"))
      .limit(50)

  private val dedupLimitOracle =
    """SELECT l_partkey, l_orderkey, l_linenumber, l_quantity
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY l_partkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS rn
      |  FROM lineitem
      |) WHERE rn = 1
      |ORDER BY l_partkey
      |LIMIT 50""".stripMargin

  /** P8: projection/column drop (the reference MEANT to drop Title,
    * `dag.py:163`). `.explain` shows ReadSchema with only 3 columns and
    * the size filter in PushedFilters — scan-level pruning+pushdown.
    */
  def dropProjection(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .filter(col("p_size") > 25)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_partkey"))

  private val dropProjectionOracle =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part WHERE p_size > 25
      |ORDER BY p_partkey""".stripMargin

  /** J1: inner equi-join chain fact→dim→dim with group-by (revenue per
    * nation). Dimensions broadcast — no fact-side shuffle for the join.
    */
  def joinInnerAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(Enrich.exactSum(col("o_totalprice")), 4).as("revenue"))
      .orderBy(col("n_name"))

  private val joinInnerOracle =
    """SELECT n_name, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left outer join with null-aware aggregates (capability class the
    * reference lacks — SURVEY §2.4 note).
    */
  def joinLeftAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.nation(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("n_nationkey") === col("c_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"),
        round(coalesce(Enrich.exactSum(col("c_acctbal")), lit(0.0)), 4).as("acctbal_sum"))
      .orderBy(col("n_name"))

  private val joinLeftOracle =
    """SELECT n_name, count(c_custkey) AS n_customers,
      |  round(coalesce(CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE), 0), 4) AS acctbal_sum
      |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left-semi join (EXISTS): customers with a big order. */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_totalprice") > 400000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  private val joinSemiOracle =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer WHERE EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no big finished order.
    * The `seen_titles` membership skip (`dag.py:97`) is this shape.
    */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 300000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  private val joinAntiOracle =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
      |    AND o_totalprice > 300000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** A1-A5: the full aggregate family in ONE pass (TPC-H Q1 shape).
    * Partial aggregation (map-side combine) + one shuffle on the group
    * key; Catalyst fuses all six aggregates into one HashAggregateExec.
    */
  def aggGroup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(Enrich.exactSum(col("l_quantity")), 4).as("sum_qty"),
        round(Enrich.exactSum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(Enrich.exactSum(
          col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")), 8), 4)
          .as("sum_disc_price"),
        Enrich.roundDiv4(sum(col("l_quantity").cast("decimal(38,0)")),
          count(col("l_quantity"))).as("avg_qty"),
        Enrich.roundDiv4(
          sum((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("decimal(38,0)")),
          count(col("l_extendedprice")) * 100).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private[graft] val aggGroupOracle =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_base_price,
      |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_disc_price,
      |  """.stripMargin +
    Enrich.roundDiv4Sql("sum(CAST(l_quantity AS BIGINT))", "count(l_quantity)") +
    """ AS avg_qty,
      |  """.stripMargin +
    Enrich.roundDiv4Sql("sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT))",
      "100*count(l_extendedprice)") +
    """ AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** P1: the empty-input guard as a data-quality check row.
    * (`Standardise.requireNonEmpty` is the throwing form used inside
    * pipelines; this query exposes the predicate itself.)
    */
  def emptyGuard(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") < 0)
      .agg(count(lit(1)).as("n_rows"))
      .select(col("n_rows"), (col("n_rows") === 0).as("is_empty"))

  private val emptyGuardOracle =
    """SELECT count(*) AS n_rows, count(*) = 0 AS is_empty
      |FROM lineitem WHERE l_quantity < 0""".stripMargin

  /** Sinks K1-K3 as set-based writes: write a filtered projection to
    * parquet (the engine's "CREATE TABLE + INSERT"), read it back,
    * aggregate. One partition-parallel columnar write replaces the
    * reference's one-INSERT-per-row loop (`dag.py:203-204,224-225`).
    */
  def sinkRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_sink_roundtrip"
    Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(Enrich.exactSum(col("o_totalprice")), 4).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val sinkRoundtripOracle =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM orders WHERE o_orderstatus = 'O'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** K2/K3 through the LITERAL target technology: a set-based
    * `df.write.format("jdbc")` into an embedded Derby table (the
    * reference INSERTs row-by-row into Postgres,
    * `dag.py:203-204,224-225`), read back over JDBC, aggregated. The
    * oracle aggregates the base table directly, so the hash check
    * proves the RDBMS round-trip is lossless.
    */
  def sinkJdbc(spark: SparkSession, sfDir: String): DataFrame = {
    val url = "jdbc:derby:memory:graft_sink;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    graft.sources.JdbcSink.write(
      Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal")),
      url, "supplier_sink", driver)
    graft.sources.JdbcSink.read(spark, url, "supplier_sink", driver)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(Enrich.exactSum(col("s_acctbal")), 4).as("acctbal_sum"))
      .orderBy(col("s_nationkey"))
  }

  private val sinkJdbcOracle =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |  round(CAST(sum(CAST(s_acctbal AS DECIMAL(28,4))) AS DOUBLE), 4) AS acctbal_sum
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("flagship_enrich", Some(flagshipOracle), flagshipEnrich),
    Q("standardise_books", Some(standardiseOracle), standardiseBooks),
    Q("enrich_books", Some(enrichOracle), enrichBooks),
    Q("dedup_limit", Some(dedupLimitOracle), dedupLimit),
    Q("drop_projection", Some(dropProjectionOracle), dropProjection),
    Q("join_inner_agg", Some(joinInnerOracle), joinInnerAgg),
    Q("join_left_agg", Some(joinLeftOracle), joinLeftAgg),
    Q("join_semi", Some(joinSemiOracle), joinSemi),
    Q("join_anti", Some(joinAntiOracle), joinAnti),
    Q("agg_group", Some(aggGroupOracle), aggGroup),
    Q("empty_guard", Some(emptyGuardOracle), emptyGuard),
    Q("sink_roundtrip", Some(sinkRoundtripOracle), sinkRoundtrip),
    Q("sink_jdbc", Some(sinkJdbcOracle), sinkJdbc),
  )
}
