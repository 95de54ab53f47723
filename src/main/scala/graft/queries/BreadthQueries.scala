package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.operators.Enrich
import graft.sources.Tables

/** Remaining capability breadth: typed JSON parsing, array functions,
  * null-handling functions, partition-window analytics, and the
  * reference's K1 DDL surface done literally on the session catalog.
  */
object BreadthQueries {

  /** Schema'd `from_json` (vs. path-probing `get_json_object`): parse
    * `events.props` into a typed struct, then aggregate. Malformed
    * JSON would land as null struct — the PERMISSIVE-mode contract.
    */
  def fromJsonTyped(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, sfDir)
      .select(col("event_type"), from_json(col("props"), schema).as("p"))
      .select(col("event_type"), col("p.k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_parsed"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("event_type"))
  }

  private val fromJsonOracle =
    """SELECT event_type,
      |  count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_parsed,
      |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Array-function surface over the embedding vectors: element
    * access, slicing, min/max, size, sort — all per-row (no float
    * accumulation, so plain double compares hold).
    */
  def arrayFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        size(emb).as("dim"),
        round(element_at(emb, 1), 6).as("first"),
        round(element_at(emb, -1), 6).as("last"),
        round(array_min(emb), 6).as("mn"),
        round(array_max(emb), 6).as("mx"),
        round(element_at(array_sort(emb), 32), 6).as("median_lo"),
        round(element_at(slice(emb, 1, 3), 2), 6).as("second"))
      .orderBy(col("vec_id"))
  }

  /** Higher-order-function surface: lambda-taking array functions
    * (`transform`, `filter`, `aggregate`, `zip_with`, `exists`,
    * `forall`) over the embedding vectors, each paired with its DuckDB
    * `list_*` twin. HOFs run INTERPRETED in Spark (lambdas never enter
    * whole-stage codegen — the reason the hot paths here use native
    * expressions like [[graft.functions.CosineSimilarity]] instead:
    * see TextOps.shingles3's note), so this query pins their
    * SEMANTICS; the plan-shape lesson lives with the native kernels.
    * The `aggregate` fold accumulates left-to-right in both engines —
    * the same sequential-order guarantee [[graft.operators.Dedup.dot]]
    * relies on — so even the float fold hash-matches.
    */
  def arrayHof(spark: SparkSession, sfDir: String): DataFrame = {
    // lambdas force expr() strings here, so each projection spells the
    // cast inline — a Scala-side `emb` binding cannot reach into them
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        round(expr("aggregate(CAST(embedding AS ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"), 6)
          .as("sumsq_fold"),
        size(expr("filter(CAST(embedding AS ARRAY<DOUBLE>), x -> x > 0)")).as("n_pos"),
        round(element_at(expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x -> abs(x))"), 1), 6)
          .as("abs_first"),
        round(element_at(
          expr("zip_with(CAST(embedding AS ARRAY<DOUBLE>), reverse(CAST(embedding AS ARRAY<DOUBLE>)), (a, b) -> a * b)"), 1), 6)
          .as("palindrome_prod_first"),
        expr("exists(CAST(embedding AS ARRAY<DOUBLE>), x -> x > 0.2)").as("any_big"),
        expr("forall(CAST(embedding AS ARRAY<DOUBLE>), x -> abs(x) < 1.0)").as("all_unit"))
      .orderBy(col("vec_id"))
  }

  private val hofOracle =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings)
      |SELECT vec_id,
      |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), emb),
      |        (acc, x) -> acc + x * x), 6) AS sumsq_fold,
      |  CAST(len(list_filter(emb, x -> x > 0)) AS INT) AS n_pos,
      |  round(list_transform(emb, x -> abs(x))[1], 6) AS abs_first,
      |  round(emb[1] * emb[len(emb)], 6) AS palindrome_prod_first,
      |  len(list_filter(emb, x -> x > 0.2)) > 0 AS any_big,
      |  len(list_filter(emb, x -> abs(x) >= 1.0)) = 0 AS all_unit
      |FROM e ORDER BY vec_id""".stripMargin

  private val arrayOracle =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings)
      |SELECT vec_id,
      |  CAST(len(emb) AS INT) AS dim,
      |  round(emb[1], 6) AS first,
      |  round(emb[-1], 6) AS last,
      |  round(list_min(emb), 6) AS mn,
      |  round(list_max(emb), 6) AS mx,
      |  round(list_sort(emb)[32], 6) AS median_lo,
      |  round(list_slice(emb, 1, 3)[2], 6) AS second
      |FROM e ORDER BY vec_id""".stripMargin

  /** ANSI-mode safe-cast surface: Spark 4 runs ANSI SQL semantics by
    * default — a malformed CAST, division by zero, or arithmetic
    * overflow THROWS instead of silently producing null (the pandas
    * reference's `pd.to_numeric(errors='coerce')` world is the
    * opposite default, `dag.py:150-156`). The `try_*` family is the
    * engine's explicit opt-in to coercion: same codegen'd expressions,
    * null on failure, error classes preserved elsewhere. Each column
    * here exercises one failure class; AnsiSpec asserts the throwing
    * counterparts really throw.
    */
  def ansiSafeCasts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        // malformed string → null (not NumberFormatException)
        expr("try_cast(p_name AS INT)").as("bad_cast"),
        // well-formed roundtrip stays exact
        expr("try_cast(CAST(p_size AS STRING) AS INT)").as("good_cast"),
        // divide by zero → null (not DIVIDE_BY_ZERO)
        expr("try_divide(p_retailprice, p_size - p_size)").as("div0"),
        // bigint overflow → null (not ARITHMETIC_OVERFLOW)
        expr("try_add(9223372036854775807L, CAST(p_size AS BIGINT))").as("overflow"))
      .orderBy(col("p_partkey"))
      .limit(200)

  private val ansiSafeOracle =
    """SELECT p_partkey,
      |  TRY_CAST(p_name AS INT) AS bad_cast,
      |  TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS good_cast,
      |  p_retailprice / NULLIF(p_size - p_size, 0) AS div0,
      |  TRY_CAST(9223372036854775807 + CAST(p_size AS HUGEINT) AS BIGINT) AS overflow
      |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin

  /** Null-handling functions: coalesce / nullif / nvl2-shape / null
    * counting over a column with injected nulls (acctbal < 0 → null).
    */
  def nullHandling(spark: SparkSession, sfDir: String): DataFrame = {
    val bal = when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal"))
    Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), bal.as("bal"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        count(col("bal")).as("n_nonnull"),
        sum(when(col("bal").isNull, 1).otherwise(0)).as("n_null"),
        round(Enrich.exactSum(coalesce(col("bal"), lit(0.0))), 4).as("bal_or_zero_sum"),
        round(Enrich.exactSum(nullif(coalesce(col("bal"), lit(0.0)), lit(0.0))), 4)
          .as("nonzero_sum"))
      .orderBy(col("c_mktsegment"))
  }

  private val nullOracle =
    """WITH c AS (
      |  SELECT c_mktsegment,
      |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      |  FROM customer)
      |SELECT c_mktsegment, count(*) AS n,
      |  count(bal) AS n_nonnull,
      |  CAST(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  round(CAST(sum(CAST(coalesce(bal, 0.0) AS DECIMAL(28,4))) AS DOUBLE), 4) AS bal_or_zero_sum,
      |  round(CAST(sum(CAST(nullif(coalesce(bal, 0.0), 0.0) AS DECIMAL(28,4))) AS DOUBLE), 4) AS nonzero_sum
      |FROM c GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Partitioned analytic average: customers above their nation's mean
    * balance (the correlated-subquery shape as a window aggregate —
    * computed once per partition, not once per row).
    */
  def windowPartitionAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    // nation mean from exact sums: deterministic across partitionings
    val mean = Enrich.roundDiv4(
      sum((col("c_acctbal").cast("decimal(18,2)") * 100).cast("decimal(38,0)")).over(w),
      count(col("c_acctbal")).over(w) * 100)
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        mean.as("nation_avg"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("acctbal"), col("nation_avg"))
      .orderBy(col("c_custkey"))
  }

  private val windowAvgOracle = {
    val mean = Enrich.roundDiv4Sql(
      "sum(CAST(CAST(c_acctbal AS DECIMAL(18,2))*100 AS BIGINT)) OVER (PARTITION BY c_nationkey)",
      "100*count(c_acctbal) OVER (PARTITION BY c_nationkey)")
    s"""SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal, nation_avg
       |FROM (
       |  SELECT c_custkey, c_nationkey, c_acctbal, $mean AS nation_avg
       |  FROM customer)
       |WHERE c_acctbal > nation_avg
       |ORDER BY c_custkey""".stripMargin
  }

  /** K1 literally: session-catalog DDL + set-based INSERT + read-back.
    * DROP first so driver re-runs stay idempotent (the reference
    * re-INSERTs duplicates on rerun — §2.7 calls that out as the
    * semantic we deliberately improve).
    */
  def ddlCatalog(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("graft_supplier_src")
    spark.sql("DROP TABLE IF EXISTS graft_suppliers")
    // explicit LOCATION + dir wipe: a fresh session's in-memory catalog
    // forgets the table but the directory survives, and CTAS refuses
    // non-empty locations
    val loc = s"${System.getProperty("java.io.tmpdir")}/graft_wh_suppliers"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(loc))
    spark.sql(
      s"""CREATE TABLE graft_suppliers USING parquet LOCATION '$loc' AS
         |SELECT s_suppkey, s_name, s_nationkey, s_acctbal
         |FROM graft_supplier_src""".stripMargin)
    spark.sql(
      """SELECT s_nationkey, count(*) AS n_suppliers,
        |  round(CAST(sum(CAST(s_acctbal AS DECIMAL(28,4))) AS DOUBLE), 4) AS acctbal_sum
        |FROM graft_suppliers
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
  }

  private val ddlOracle =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |  round(CAST(sum(CAST(s_acctbal AS DECIMAL(28,4))) AS DOUBLE), 4) AS acctbal_sum
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** CUBE over (status, priority): all four grouping-set combinations
    * in one pass (the full grouping-sets surface next to `rollup_agg`'s
    * hierarchical one). `grouping()` flags disambiguate real NULLs
    * from subtotal rows.
    */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        round(Enrich.exactSum(col("o_totalprice")), 4).as("revenue"))
      .select(col("g_status"), col("g_priority"),
        col("o_orderstatus"), col("o_orderpriority"),
        col("n_orders"), col("revenue"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus"), col("o_orderpriority"))

  private val cubeOracle =
    """SELECT
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
      |  o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""".stripMargin

  /** UNPIVOT (melt) — the inverse reshape of `pivot_flags`: wide
    * numeric columns to (key, metric, value) long form, the shape
    * feature stores and metric pipelines ingest. Narrow map-only
    * operator (each input row emits k rows, no shuffle until the
    * final sort).
    */
  def unpivotMetrics(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        col("c_nationkey").cast("double").as("nationkey"))
      .unpivot(Array(col("c_custkey")),
        Array(col("acctbal"), col("nationkey")), "metric", "value")
      .orderBy(col("c_custkey"), col("metric"))

  private val unpivotOracle =
    """SELECT c_custkey, metric, value FROM (
      |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
      |    CAST(c_nationkey AS DOUBLE) AS nationkey FROM customer)
      |UNPIVOT (value FOR metric IN (acctbal, nationkey))
      |ORDER BY c_custkey, metric""".stripMargin

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): rows whose
    * join key is NULL still match the NULL group — the semantics a
    * plain `=` join silently drops. Key is synthesized with `nullif`
    * so both engines build identical NULL populations. Plans as a
    * normal hash/sort-merge join (null-safe keys are still shuffle
    * keys), so the scale shape is unchanged.
    */
  def joinNullSafe(spark: SparkSession, sfDir: String): DataFrame = {
    val key = nullif(col("c_nationkey") % 5, lit(0))
    val left = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), key.as("k"))
    val dim = Tables.customer(spark, sfDir)
      .groupBy(key.as("k")).agg(count(lit(1)).as("n_in_group"))
      .select(col("k").as("dk"), col("n_in_group"))
    left.join(dim, col("k") <=> col("dk"))
      .select(col("c_custkey"), col("k"), col("n_in_group"))
      .orderBy(col("c_custkey"))
  }

  private val nullSafeOracle =
    """WITH l AS (
      |  SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k FROM customer),
      |d AS (
      |  SELECT nullif(c_nationkey % 5, 0) AS k, count(*) AS n_in_group
      |  FROM customer GROUP BY 1)
      |SELECT l.c_custkey, l.k, d.n_in_group
      |FROM l JOIN d ON l.k IS NOT DISTINCT FROM d.k
      |ORDER BY l.c_custkey""".stripMargin

  /** Slowly-changing-dimension type 2 from a change stream: events are
    * read as CDC records of a per-user attribute (`event_type` stands
    * in for the tracked attribute), consecutive no-op updates are
    * dropped, and each surviving change becomes a versioned dimension
    * row with a `[valid_from, valid_to)` interval and an `is_current`
    * flag — the warehouse-standard history build that completes the
    * mutation trio next to `merge_upsert` (SCD1) and `snapshot_diff`
    * (CDC derivation).
    *
    * Plan shape: ONE hash shuffle on the dimension key; the
    * change-detect `lag`, the `version` numbering, and the `valid_to`
    * `lead` all share the same (partition, ordering), so Catalyst
    * reuses a single exchange — the filter between them keeps rows
    * inside the same partitions. No driver state, no collect: the 100
    * TB history rebuild is this same one-shuffle window pass. Ties are
    * impossible by construction (ordering includes the unique
    * event_id).
    */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Scd2.history(Tables.events(spark, sfDir))
      .orderBy(col("user_id"), col("version"))

  private val scd2Oracle =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id
      |  FROM ordered WHERE prev IS NULL OR prev <> event_type),
      |ver AS (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM chg)
      |SELECT user_id, version, event_type AS attr, ts AS valid_from,
      |  valid_to, valid_to IS NULL AS is_current
      |FROM ver ORDER BY user_id, version""".stripMargin

  /** Point-in-time dimension lookup — the consuming half of
    * [[scd2History]]: enrich each event with the dimension version
    * that was valid AT its timestamp (`valid_from <= ts < valid_to`,
    * open current row matches everything after its start). This is
    * what an SCD2 table is FOR; pairing it with the build closes the
    * loop the way `join_asof` closes the trades/quotes loop.
    *
    * Plan shape: equi-join on the dimension key with the interval
    * predicate as a residual filter — per-key histories are short
    * (versions per user), so the hash/SMJ on `user_id` is the right
    * plan at any scale; the interval residual evaluates per matched
    * pair, never as a range scan. Every event matches exactly one
    * version by construction (intervals partition each user's
    * timeline from their first change), asserted by the row count
    * staying = events-with-history.
    *
    * The probed events are offset by +1 second so lookups land
    * strictly INSIDE intervals, exercising the half-open boundary
    * rule rather than only hitting `ts = valid_from` rows.
    */
  def scd2Lookup(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = scd2History(spark, sfDir)
      .select(col("user_id"), col("version"), col("attr"),
        col("valid_from"), col("valid_to"))
    val probes = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        (col("ts") + expr("INTERVAL 1 SECOND")).as("at_ts"))
    probes.join(dim, Seq("user_id"))
      .filter(col("valid_from") <= col("at_ts") &&
        (col("valid_to").isNull || col("at_ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("at_ts"),
        col("version"), col("attr"))
      .orderBy(col("event_id"))
  }

  private val scd2LookupOracle =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id
      |  FROM ordered WHERE prev IS NULL OR prev <> event_type),
      |dim AS (
      |  SELECT user_id, event_type AS attr, ts AS valid_from,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM chg),
      |probes AS (
      |  SELECT event_id, user_id, ts + INTERVAL 1 SECOND AS at_ts FROM events)
      |SELECT p.event_id, p.user_id, p.at_ts, d.version, d.attr
      |FROM probes p JOIN dim d ON p.user_id = d.user_id
      |WHERE d.valid_from <= p.at_ts
      |  AND (d.valid_to IS NULL OR p.at_ts < d.valid_to)
      |ORDER BY p.event_id""".stripMargin

  /** Map-typed column surface (the one container type the relational
    * breadth rows didn't yet exercise — arrays, structs and VARIANT
    * are covered elsewhere): build a per-document word→count MAP from
    * real data (`map_from_entries` over the sorted entry array — the
    * sort makes construction order canonical, so the map is identical
    * under any partitioning), then drive the map-function family over
    * it — `size` (cardinality), `element_at` point lookup,
    * `map_filter` + `transform_values` (the map HOFs; interpreted,
    * like all lambdas — semantics pinned here, hot paths use native
    * expressions), and `explode_outer` back to rows (the map
    * generator face; _outer keeps documents whose filtered map is
    * empty, pinning null-row semantics). DuckDB's MAP type is the
    * oracle twin: `map_from_entries`/`cardinality`/`map_extract`/
    * `map_entries` + lateral unnest.
    *
    * 100 TB shape: one word-count aggregate (map-side partials), one
    * per-doc map build; all map ops are per-row from there. The map
    * column never crosses a shuffle after construction.
    */
  def mapFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextOps
    val counts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).cast("int").as("cnt"))
    val maps = counts.groupBy(col("doc_id"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("word").as("k"), col("cnt").as("v"))))).as("wc"))
    maps.select(col("doc_id"),
        size(col("wc")).as("n_distinct"),
        coalesce(element_at(col("wc"), lit("the")), lit(0)).as("the_cnt"),
        expr("transform_values(map_filter(wc, (k, v) -> v >= 3), (k, v) -> v * v)")
          .as("hot"))
      .select(col("doc_id"), col("n_distinct"), col("the_cnt"),
        explode_outer(col("hot")).as(Seq("word", "sq_cnt")))
      .orderBy(col("doc_id"), col("word"))
  }

  private val mapOracle =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |c AS (SELECT doc_id, word, CAST(count(*) AS INT) AS cnt
      |      FROM w GROUP BY 1, 2),
      |m AS (SELECT doc_id,
      |    map_from_entries(list_sort(list(struct_pack(k := word, v := cnt)))) AS wc
      |  FROM c GROUP BY doc_id),
      |x AS (
      |  SELECT doc_id, CAST(cardinality(wc) AS INT) AS n_distinct,
      |    CAST(coalesce(map_extract(wc, 'the')[1], 0) AS INT) AS the_cnt,
      |    list_filter(map_entries(wc), e -> e.value >= 3) AS hot
      |  FROM m)
      |SELECT doc_id, n_distinct, the_cnt, u.e.key AS word,
      |  CAST(u.e.value * u.e.value AS INT) AS sq_cnt
      |FROM x LEFT JOIN LATERAL unnest(hot) AS u(e) ON TRUE
      |ORDER BY doc_id, word""".stripMargin

  /** Cost-based join reordering, driven end to end: ANALYZE-collected
    * catalog statistics flow into Catalyst's `JoinReorderDP`, which
    * rewrites a deliberately BAD syntactic join order (fact ⋈ fact
    * first, the selective dim last) into the stats-optimal one (the
    * filtered dim joins first, the big fact joins the small
    * intermediate). At 100 TB this is the difference between an
    * intermediate the size of lineitem⋈orders and one the size of the
    * filtered customer's order set — a reorder no syntax-driven
    * planner makes. CboSpec pins BOTH directions: with stats the
    * innermost join is (orders ⋈ customer); without, Catalyst keeps
    * the written (lineitem ⋈ orders) order — proving the reorder is
    * stats-driven, not incidental.
    *
    * The stats/no-stats variants use DISJOINT table names: catalog
    * statistics live in the shared external catalog, so a shared name
    * would leak one variant's stats into the other.
    */
  private[graft] def cboQuery(spark: SparkSession, sfDir: String,
      stats: Boolean): DataFrame = {
    val s = spark.newSession()
    if (stats) {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    }
    val sfx = if (stats) "s" else "n"
    val tmp = System.getProperty("java.io.tmpdir")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    def ctas(name: String, src: DataFrame, cols: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS ${name}_$sfx")
      val loc = s"$tmp/graft_wh_${name}_$sfx"
      rm(new java.io.File(loc))
      src.createOrReplaceTempView(s"${name}_src")
      s.sql(s"""CREATE TABLE ${name}_$sfx USING parquet LOCATION '$loc'
               |AS SELECT $cols FROM ${name}_src""".stripMargin)
      if (stats) s.sql(
        s"ANALYZE TABLE ${name}_$sfx COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    ctas("graft_cbo_li", Tables.lineitem(s, sfDir),
      "l_orderkey, l_extendedprice")
    ctas("graft_cbo_ord", Tables.orders(s, sfDir), "o_orderkey, o_custkey")
    ctas("graft_cbo_cust", Tables.customer(s, sfDir),
      "c_custkey, c_mktsegment, c_acctbal")
    // written in the WORST order: the two facts joined first, the
    // selective dim appended last
    s.sql(
      s"""SELECT c_mktsegment, count(*) AS n_items,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE), 4)
         |    AS revenue
         |FROM graft_cbo_li_$sfx l
         |JOIN graft_cbo_ord_$sfx o ON l.l_orderkey = o.o_orderkey
         |JOIN graft_cbo_cust_$sfx c ON o.o_custkey = c.c_custkey
         |WHERE c.c_acctbal > 9000
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin)
  }

  def cboJoinReorder(spark: SparkSession, sfDir: String): DataFrame =
    cboQuery(spark, sfDir, stats = true)

  private val cboOracle =
    """SELECT c_mktsegment, count(*) AS n_items,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE), 4)
      |    AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_acctbal > 9000
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("cbo_join_reorder", Some(cboOracle), cboJoinReorder),
    Q("map_functions", Some(mapOracle), mapFunctions),
    Q("from_json_typed", Some(fromJsonOracle), fromJsonTyped),
    Q("scd2_history", Some(scd2Oracle), scd2History),
    Q("scd2_lookup", Some(scd2LookupOracle), scd2Lookup),
    Q("unpivot_metrics", Some(unpivotOracle), unpivotMetrics),
    Q("join_null_safe", Some(nullSafeOracle), joinNullSafe),
    Q("array_functions", Some(arrayOracle), arrayFunctions),
    Q("array_hof", Some(hofOracle), arrayHof),
    Q("null_handling", Some(nullOracle), nullHandling),
    Q("ansi_safe_casts", Some(ansiSafeOracle), ansiSafeCasts),
    Q("window_partition_avg", Some(windowAvgOracle), windowPartitionAvg),
    Q("ddl_catalog", Some(ddlOracle), ddlCatalog),
    Q("cube_agg", Some(cubeOracle), cubeAgg),
  )
}
