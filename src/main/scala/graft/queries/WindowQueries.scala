package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Enrich
import graft.sources.Tables

/** Time-window and analytic-window queries.
  *
  * The reference's only "windowing" is its 5-minute cron period
  * (`/root/reference/dags/dag.py:29`, schedule "every 5 minutes"):
  * every run is one 5-minute micro-batch. [[tumbling]] is that
  * semantics as a first-class event-time operator — `window(ts, "5
  * minutes")` — which is also exactly what the Structured Streaming
  * variant of this engine groups by (see `graft.streaming`). The
  * analytic windows (rank / lag / running sum) are the capability-class
  * extension the pandas reference lacks entirely.
  */
object WindowQueries {

  /** Event-time tumbling window — batch form of the reference's
    * 5-minute schedule. Same `groupBy(window(...))` plan works under
    * `readStream` with a watermark.
    *
    * Round 10: re-pointed at the DV-BACKED catalog table
    * ([[graft.sources.DvTables.events]], `format("graft-dv")`) against
    * its unchanged oracle — the proof that ordinary queries read a
    * mutable deletion-vector table transparently: the optimizer swaps
    * the placeholder for the manifest-fed masked plan, and with zero
    * tombstones that plan is a bare parquet scan of the committed
    * files (no mask filter at all).
    */
  def tumbling(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.DvTables.events(spark, sfDir)
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(Enrich.exactSum(col("value")), 4).as("value_sum"))
      .select(col("window.start").as("w_start"), col("n_events"), col("value_sum"))
      .orderBy(col("w_start"))

  private val tumblingOracle =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS value_sum
      |FROM events GROUP BY w_start ORDER BY w_start""".stripMargin

  /** Top-N per group via row_number over an explicit (total) ordering —
    * deterministic tie-break on the unique orderkey.
    */
  def rankTopN(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  private val rankOracle =
    """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders
      |) WHERE rnk <= 3
      |ORDER BY o_orderpriority, rnk""".stripMargin

  /** lag + running sum per user over event time — sequence analytics.
    * The running sum accumulates in DECIMAL so the prefix sums are
    * exact (order is defined, but double accumulation would still
    * round differently from the oracle's). Unique (ts, event_id)
    * ordering makes RANGE and ROWS frames coincide in both engines.
    */
  def lagRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_sum"))
  }

  private val lagOracle =
    """SELECT user_id, event_id, value,
      |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS running_sum
      |FROM events""".stripMargin

  /** Distribution windows: ntile quartiles, percent_rank, and the
    * per-partition maximum via first_value over a descending order.
    * Order keys include `o_orderkey` so every rank is fully
    * deterministic (ties in price cannot flip assignments).
    */
  def ntileRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wDesc = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).as("price_quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        first_value(col("o_totalprice")).over(wDesc).as("status_max_price"))
      .orderBy(col("o_orderkey"))
  }

  private val ntileOracle =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  ntile(4) OVER w AS price_quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  first_value(o_totalprice) OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice DESC, o_orderkey) AS status_max_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Batch sessionization: a session break is a >30-minute gap in a
    * user's event stream; session ids are the running count of breaks.
    * Two stacked windows over the SAME (user_id, ts, event_id) sort —
    * Catalyst plans one shuffle + one sort for both — then a rollup per
    * session. The streaming twin of this operator is
    * `session_window(ts, "30 minutes")` in `graft.streaming`. Times
    * compared in whole epoch seconds (both engines truncate the same
    * way on post-epoch data); unique event_id tie-break keeps the
    * running count deterministic.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val es = col("ts").cast("long")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = es - lag(es, 1).over(w)
    Tables.events(spark, sfDir)
      .withColumn("is_new",
        when(gap.isNull || gap > 1800L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(es).as("t_start"), max(es).as("t_end"),
        round(Enrich.exactSum(col("value")), 4).as("value_sum"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val sessionOracle =
    """WITH e AS (
      |  SELECT user_id, event_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    ts
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_id, value, es,
      |    es - lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap,
      |    ts
      |  FROM e),
      |s AS (
      |  SELECT user_id, value, es,
      |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(es) AS t_start, max(es) AS t_end,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS value_sum
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Native `session_window` operator (vs [[sessionize]]'s hand-rolled
    * lag-chain): Spark's built-in session aggregation with a 30-minute
    * gap. Semantics differ from the lag form at EXACT gap boundaries —
    * the built-in window is half-open [start, last+gap), so an event
    * landing exactly 30 min after its predecessor starts a NEW session
    * (the lag form's `gap > 1800` keeps it) — and the oracle encodes
    * that (`gap_us >= 1800000000` splits, at MICROSECOND precision:
    * the operator compares raw timestamps, so an oracle that floors to
    * whole seconds first inflates a 1799.34 s gap to 1800 and splits a
    * session Spark merges — caught by the sf0.1 cross-scale gate,
    * round 5). At scale this is one shuffle on
    * user_id with sessions merged inside the aggregate (no window
    * function pass), and the SAME operator runs under `readStream` +
    * watermark for streaming sessionization (Streaming.scala) — the
    * batch/stream unification the hand-rolled form can't offer.
    */
  def sessionizeNative(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(Enrich.exactSum(col("value")), 4).as("value_sum"))
      .select(col("user_id"),
        col("w.start").cast("long").as("t_start"),
        col("w.end").cast("long").as("t_end"),
        col("n_events"), col("value_sum"))
      .orderBy(col("user_id"), col("t_start"))

  private val sessionNativeOracle =
    """WITH g AS (
      |  SELECT user_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    epoch_us(ts) -
      |      lag(epoch_us(ts))
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
      |    ts, event_id
      |  FROM events),
      |s AS (
      |  SELECT user_id, value, es,
      |    CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM g)
      |SELECT user_id, min(es) AS t_start, max(es) + 1800 AS t_end,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS value_sum
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, t_start""".stripMargin

  /** Explicit sliding ROWS frame: 4-order moving revenue per customer
    * (`ROWS BETWEEN 3 PRECEDING AND CURRENT ROW`) — the bounded-frame
    * window class (`rowsBetween`) the other analytic queries don't
    * touch. Frame sums are exact DECIMAL (summation-order-free) and
    * the sort key (o_orderdate, o_orderkey) is unique, so every frame
    * is deterministic. At scale this is one shuffle on o_custkey and
    * a per-partition sort — the frame itself never crosses executors.
    */
  def slidingFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    Tables.orders(spark, sfDir)
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice").cast("decimal(28,4)")).over(w), 4)
          .cast("double").as("mov_revenue"),
        count(lit(1)).over(w).as("frame_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val slidingOracle =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS mov_revenue,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS frame_n
      |FROM orders
      |WHERE o_custkey % 10 = 0
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Time-series gap filling + linear interpolation: the observed
    * 5-minute slots per event type are joined onto the COMPLETE slot
    * grid (`sequence()` from min to max slot — generated, never
    * materialized from input), and empty slots take the linear
    * interpolation between their nearest observed neighbors
    * (IGNORE-NULLS `last`/`first` window functions find them in one
    * pass — no self-join). Leading/trailing gaps extend the nearest
    * endpoint. At 100 TB the grid is ~slots×types rows (tiny relative
    * to events); the only data shuffle is the slot aggregation, and
    * the interpolation windows partition by type — bounded state,
    * stream-compatible. Endpoints are pre-rounded so the
    * interpolation arithmetic is deterministic cross-engine.
    */
  def tsGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val slotSec = (floor(unix_timestamp(col("ts")) / 300) * 300).cast("long")
    // two consumers (grid bounds + the left join): persist so events
    // are scanned and slot-aggregated once
    val observed = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), slotSec.as("slot_sec"))
      .agg(round(Enrich.exactSum(col("value")), 4).as("v"))
      .persist()
    val grid = observed.groupBy(col("event_type"))
      .agg(min(col("slot_sec")).as("lo"), max(col("slot_sec")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(300L))).as("slot_sec"))
    // Both neighbor lookups as RUNNING frames: Spark executes
    // [CURRENT, UNBOUNDED FOLLOWING] frames by rescanning the rest of
    // the partition per row — O(n²), measured 25-30 s cold on 43k
    // slots. "First non-null after" == "last non-null before" under a
    // DESC sort, which is a running O(n) frame (one extra sort).
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("slot_sec"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNextR = Window.partitionBy(col("event_type")).orderBy(col("slot_sec").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val pv = last(col("v"), ignoreNulls = true).over(wPrev)
    val ps = last(when(col("v").isNotNull, col("slot_sec")), ignoreNulls = true).over(wPrev)
    val nv = last(col("v"), ignoreNulls = true).over(wNextR)
    val ns = last(when(col("v").isNotNull, col("slot_sec")), ignoreNulls = true).over(wNextR)
    grid.join(observed, Seq("event_type", "slot_sec"), "left")
      .select(col("event_type"), col("slot_sec"), col("v"),
        pv.as("pv"), ps.as("ps"), nv.as("nv"), ns.as("ns"))
      .select(col("event_type"),
        timestamp_seconds(col("slot_sec")).as("slot"),
        col("v").isNull.cast("int").as("is_gap"),
        // NOT re-rounded: the endpoints are already 4-decimal values and
        // both engines evaluate this exact IEEE expression tree, so the
        // doubles agree bit-for-bit — while round() on a result that
        // lands on a .00005 midpoint diverges between BigDecimal-repr
        // (Spark) and binary (DuckDB) rounding
        coalesce(col("v"),
          col("pv") + (col("nv") - col("pv")) *
            (col("slot_sec") - col("ps")) / (col("ns") - col("ps")),
          col("pv"), col("nv")).as("value_filled"))
      .orderBy(col("event_type"), col("slot"))
  }

  private val gapfillOracle =
    """WITH b AS (
      |  SELECT event_type, CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS slot_sec,
      |    round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS v
      |  FROM events GROUP BY event_type, slot_sec),
      |g AS (
      |  SELECT event_type,
      |    unnest(generate_series(min(slot_sec), max(slot_sec), 300)) AS slot_sec
      |  FROM b GROUP BY event_type),
      |j AS (
      |  SELECT g.event_type, g.slot_sec, b.v
      |  FROM g LEFT JOIN b ON g.event_type = b.event_type AND g.slot_sec = b.slot_sec),
      |w AS (
      |  SELECT event_type, slot_sec, v,
      |    last_value(v IGNORE NULLS) OVER pw AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN slot_sec END IGNORE NULLS) OVER pw AS ps,
      |    first_value(v IGNORE NULLS) OVER nw AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN slot_sec END IGNORE NULLS) OVER nw AS ns
      |  FROM j
      |  WINDOW
      |    pw AS (PARTITION BY event_type ORDER BY slot_sec
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    nw AS (PARTITION BY event_type ORDER BY slot_sec
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, make_timestamp(slot_sec * 1000000) AS slot,
      |  CAST(v IS NULL AS INT) AS is_gap,
      |  coalesce(v, pv + (nv - pv) * (slot_sec - ps) / (ns - ps), pv, nv)
      |    AS value_filled
      |FROM w ORDER BY event_type, slot_sec""".stripMargin

  /** Ordered conversion funnel: how many users did signup → click →
    * purchase IN THAT ORDER, each step within 24 h of the previous
    * step's first qualifying occurrence. Each stage is one
    * events⋈prev-stage join filtered by the (order, window) predicate
    * plus a per-user MIN — all co-partitioned on user_id, so after the
    * first shuffle the later stages reuse the partitioning; the final
    * rollup is 3 one-row aggregates unioned. The reference has no
    * path analytics at all.
    */
  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.join(t1, "user_id")
      .filter(col("event_type") === "click" && col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.join(t2, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def rollup(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("step"), col("n_users"))
    rollup("1_signup", t1)
      .union(rollup("2_click_after", t2))
      .union(rollup("3_purchase_after", t3))
      .orderBy(col("step"))
  }

  private val funnelStepsOracle =
    """WITH t1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1
      |    AND e.ts <= t1.t1 + INTERVAL 24 HOURS GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |    AND e.ts <= t2.t2 + INTERVAL 24 HOURS GROUP BY e.user_id)
      |SELECT '1_signup' AS step, count(*) AS n_users FROM t1
      |UNION ALL SELECT '2_click_after', count(*) FROM t2
      |UNION ALL SELECT '3_purchase_after', count(*) FROM t3
      |ORDER BY step""".stripMargin

  /** Last-touch attribution: every purchase is credited to the most
    * recent PRIOR non-purchase event of the same user (the standard
    * marketing-attribution rule); purchases with no prior touchpoint
    * are credited "organic". One window over the same per-user
    * (ts, event_id) ordering every events analysis here shares —
    * `last(..., ignoreNulls) OVER (rows unbounded preceding → 1
    * preceding)` — then a small channel aggregate with an exact-
    * decimal revenue sum. Same single-shuffle scale shape as
    * [[eventsTransitions]].
    */
  def eventsAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("organic")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(Enrich.exactSum(col("value")), 4).as("revenue"))
      .orderBy(col("channel"))
  }

  private val attributionOracle =
    """WITH t AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM events)
      |SELECT coalesce(touch, 'organic') AS channel,
      |  count(*) AS n_purchases,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY channel ORDER BY channel""".stripMargin

  /** Next-event transition matrix (first-order Markov over user
    * sessions): per user, events ordered by time, each consecutive
    * (event_type → next_event_type) pair counted, with the row-
    * normalized transition probability. One window (lead over
    * user_id/ts — a per-key sort, the same shuffle every per-user
    * analysis here shares) + one small groupBy. Probabilities use
    * exact integer rounding (roundDiv4), so the matrix hash-matches.
    * Ties on ts are broken by event_id to keep the sequence
    * deterministic across engines.
    */
  def eventsTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("event_type"))
      .agg(sum(col("n")).cast("long").as("row_total"))
    pairs.join(totals, "event_type")
      .select(col("event_type"), col("next_type"), col("n"),
        Enrich.roundDiv4(col("n"), col("row_total")).as("p"))
      .orderBy(col("event_type"), col("next_type"))
  }

  private val transitionsOracle = {
    val p = Enrich.roundDiv4Sql("n", "row_total")
    s"""WITH s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (
      |  SELECT event_type, next_type, count(*) AS n FROM s
      |  WHERE next_type IS NOT NULL GROUP BY event_type, next_type),
      |t AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS row_total
      |  FROM c GROUP BY event_type)
      |SELECT c.event_type, c.next_type, c.n, $p AS p
      |FROM c JOIN t USING (event_type)
      |ORDER BY c.event_type, c.next_type""".stripMargin
  }

  /** Weekly cohort retention: users grouped by first-seen week, and
    * for each later week the share still active (distinct-user count
    * per (cohort, week-offset) over the cohort size). Two shuffles —
    * first-seen per user, then the (cohort, offset) distinct count —
    * both on keys that stay small however large events gets. Rates
    * use exact integer rounding.
    */
  def eventsRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val firstSeen = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val sizes = firstSeen.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    Tables.events(spark, sfDir)
      .join(firstSeen, "user_id")
      .select(col("cohort"), col("user_id"),
        floor((unix_timestamp(date_trunc("week", col("ts"))) -
          unix_timestamp(col("cohort"))) / 604800).cast("int").as("week_offset"))
      .distinct()
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, "cohort")
      .select(col("cohort"), col("week_offset"), col("active_users"),
        Enrich.roundDiv4(col("active_users"), col("cohort_users")).as("retention"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  private val retentionOracle = {
    val r = Enrich.roundDiv4Sql("active_users", "cohort_users")
    s"""WITH f AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
      |  FROM events GROUP BY user_id),
      |sz AS (SELECT cohort, count(*) AS cohort_users FROM f GROUP BY cohort),
      |a AS (
      |  SELECT DISTINCT f.cohort, e.user_id,
      |    CAST(floor((epoch(date_trunc('week', e.ts)) - epoch(f.cohort)) / 604800)
      |      AS INT) AS week_offset
      |  FROM events e JOIN f USING (user_id)),
      |c AS (
      |  SELECT cohort, week_offset, count(*) AS active_users
      |  FROM a GROUP BY cohort, week_offset)
      |SELECT c.cohort, c.week_offset, c.active_users, $r AS retention
      |FROM c JOIN sz USING (cohort)
      |ORDER BY c.cohort, c.week_offset""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("ts_gapfill", Some(gapfillOracle), tsGapfill),
    Q("events_attribution", Some(attributionOracle), eventsAttribution),
    Q("events_funnel", Some(funnelStepsOracle), eventsFunnel),
    Q("events_transitions", Some(transitionsOracle), eventsTransitions),
    Q("events_retention", Some(retentionOracle), eventsRetention),
    Q("window_tumbling", Some(tumblingOracle), tumbling),
    Q("window_sliding_frame", Some(slidingOracle), slidingFrame),
    Q("window_session", Some(sessionOracle), sessionize),
    Q("window_session_native", Some(sessionNativeOracle), sessionizeNative),
    Q("window_rank_topn", Some(rankOracle), rankTopN),
    Q("window_lag_running", Some(lagOracle), lagRunning),
    Q("window_ntile", Some(ntileOracle), ntileRank),
    Q("window_range_interval", Some(rangeIntervalOracle), rangeInterval),
  )

  /** RANGE frame over event TIME (vs the ROWS frame in
    * `window_sliding_frame`): per user, how many events landed in the
    * trailing hour [t−1h, t]. The frame is defined by the VALUE of
    * the order key (epoch micros), not row position — peers at the
    * same timestamp are all in-frame, so the result is deterministic
    * under ties with no tiebreak column needed. One shuffle on
    * user_id; at scale identical cost to any per-key window.
    */
  def rangeInterval(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("value_last_hour"))
      .orderBy(col("event_id"))
  }

  private val rangeIntervalOracle =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_last_hour,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_last_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin
}
