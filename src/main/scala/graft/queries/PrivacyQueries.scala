package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Structured-data privacy: k-anonymity by generalization + suppression
  * (Samarati/Sweeney), an l-diversity audit of the same release, and a
  * local-differential-privacy estimator (Warner 1965 randomized
  * response). Complements `text_pii_redact` (unstructured PII) with the
  * tabular faces a curation pipeline needs before releasing per-user
  * derived tables.
  *
  * `privacy_kanon` publishes the EQUIVALENCE-CLASS table of customers
  * under quasi-identifiers (geography, market segment, account-balance
  * bucket), escalating each under-k class up a fixed generalization
  * ladder until it clears k=[[KanonK]]:
  *
  *   level 0: (nation, segment, $1000-balance-bucket)
  *   level 1: (nation, segment, *)          — balance generalized
  *   level 2: (region, segment, *)          — geography coarsened
  *   level 3: (*, *, *)                     — suppressed remainder
  *
  * Escalation is LOCAL (only rows of under-k classes climb — finalized
  * classes never re-generalize, the standard local-recoding variant),
  * so each level is one groupBy over the escalated remainder plus a
  * broadcast-able semi/anti join on the previous level's class keys.
  * Level-3 output is the suppressed-row COUNT (those rows are withheld
  * from a release; the count itself is k-anonymity-safe to publish).
  *
  * 100 TB shape: 3 aggregations, each over a shrinking remainder, all
  * keyed on low-cardinality quasi-identifiers (map-side partials
  * collapse to |classes| rows); the class tables joined back are tiny
  * by construction (bounded by qid-domain size, not data volume) so
  * every join broadcasts. No window, no sort until the final
  * presentation orderBy over the class table.
  */
object PrivacyQueries {

  private val KanonK = 8

  def privacyKanon(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name").as("nation"),
        col("r_name").as("region"))
    val rows = Tables.customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("nation"), col("region"),
        col("c_mktsegment").as("segment"),
        // exact for IEEE doubles: /1000 then floor, both engines agree
        (floor(col("c_acctbal") / 1000) * 1000).cast("long").cast("string")
          .as("bal_bucket"))
    val l0 = rows.groupBy("nation", "segment", "bal_bucket")
      .agg(count(lit(1)).as("n"))
    val ok0 = l0.filter(col("n") >= KanonK)
      .select(col("nation").as("geo"), col("segment"), col("bal_bucket"),
        lit(0).as("level"), col("n"))
    val esc1 = rows.join(l0.filter(col("n") < KanonK)
        .select("nation", "segment", "bal_bucket"),
      Seq("nation", "segment", "bal_bucket"), "left_semi")
    val l1 = esc1.groupBy("nation", "segment").agg(count(lit(1)).as("n"))
    val ok1 = l1.filter(col("n") >= KanonK)
      .select(col("nation").as("geo"), col("segment"),
        lit("*").as("bal_bucket"), lit(1).as("level"), col("n"))
    val esc2 = esc1.join(l1.filter(col("n") < KanonK)
        .select("nation", "segment"),
      Seq("nation", "segment"), "left_semi")
    val l2 = esc2.groupBy("region", "segment").agg(count(lit(1)).as("n"))
    val ok2 = l2.filter(col("n") >= KanonK)
      .select(col("region").as("geo"), col("segment"),
        lit("*").as("bal_bucket"), lit(2).as("level"), col("n"))
    val esc3 = esc2.join(l2.filter(col("n") < KanonK)
        .select("region", "segment"),
      Seq("region", "segment"), "left_semi")
    val sup = esc3.agg(count(lit(1)).as("n"))
      .filter(col("n") > 0)
      .select(lit("*").as("geo"), lit("*").as("segment"),
        lit("*").as("bal_bucket"), lit(3).as("level"), col("n"))
    ok0.unionByName(ok1).unionByName(ok2).unionByName(sup)
      .orderBy("level", "geo", "segment", "bal_bucket")
  }

  private val kanonOracle: String =
    s"""WITH rows AS (
       |  SELECT n.n_name AS nation, r.r_name AS region,
       |    c.c_mktsegment AS segment,
       |    CAST(CAST(floor(c.c_acctbal/1000)*1000 AS BIGINT) AS VARCHAR)
       |      AS bal_bucket
       |  FROM customer c
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey),
       |l0 AS (SELECT nation, segment, bal_bucket, count(*) AS n
       |       FROM rows GROUP BY 1,2,3),
       |ok0 AS (SELECT nation AS geo, segment, bal_bucket, 0 AS level, n
       |        FROM l0 WHERE n >= $KanonK),
       |esc1 AS (SELECT rows.* FROM rows
       |         JOIN l0 ON rows.nation = l0.nation
       |           AND rows.segment = l0.segment
       |           AND rows.bal_bucket = l0.bal_bucket
       |         WHERE l0.n < $KanonK),
       |l1 AS (SELECT nation, segment, count(*) AS n FROM esc1 GROUP BY 1,2),
       |ok1 AS (SELECT nation AS geo, segment, '*' AS bal_bucket, 1 AS level, n
       |        FROM l1 WHERE n >= $KanonK),
       |esc2 AS (SELECT esc1.* FROM esc1
       |         JOIN l1 ON esc1.nation = l1.nation
       |           AND esc1.segment = l1.segment
       |         WHERE l1.n < $KanonK),
       |l2 AS (SELECT region, segment, count(*) AS n FROM esc2 GROUP BY 1,2),
       |ok2 AS (SELECT region AS geo, segment, '*' AS bal_bucket, 2 AS level, n
       |        FROM l2 WHERE n >= $KanonK),
       |esc3 AS (SELECT esc2.* FROM esc2
       |         JOIN l2 ON esc2.region = l2.region
       |           AND esc2.segment = l2.segment
       |         WHERE l2.n < $KanonK),
       |sup AS (SELECT '*' AS geo, '*' AS segment, '*' AS bal_bucket,
       |          3 AS level, count(*) AS n
       |        FROM esc3 HAVING count(*) > 0)
       |SELECT geo, segment, bal_bucket, CAST(level AS INT) AS level, n
       |FROM (SELECT * FROM ok0 UNION ALL SELECT * FROM ok1
       |      UNION ALL SELECT * FROM ok2 UNION ALL SELECT * FROM sup)
       |ORDER BY level, geo, segment, bal_bucket""".stripMargin

  /** l-diversity audit (Machanavajjhala et al. 2007,
    * "l-Diversity: privacy beyond k-anonymity"): k-anonymity bounds
    * re-identification but not ATTRIBUTE disclosure — a class where
    * every member shares one sensitive value leaks that value even at
    * k=1000. This audits the (nation, segment) quasi-identifier
    * classes against sensitive attribute = account-balance bucket:
    * per class, size n, distinct sensitive values l, and whether the
    * class clears l ≥ [[LDiv]] (distinct l-diversity, the paper's
    * simplest instantiation).
    *
    * 100 TB shape: one aggregation keyed on low-cardinality
    * (qid, sensitive) pairs — map-side partials collapse each
    * partition to |qid-domain × sensitive-domain| rows before the
    * shuffle — then a second tiny aggregate over class keys. No
    * window, no join, no sort until the presentation orderBy over the
    * bounded class table.
    */
  private val LDiv = 3

  def privacyLDiversity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        col("c_mktsegment").as("segment"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("long").as("sens"))
      .groupBy(col("nation"), col("segment"), col("sens"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("nation"), col("segment"))
      .agg(sum(col("cnt")).cast("long").as("n"),
        count(lit(1)).as("l"))
      .select(col("nation"), col("segment"), col("n"), col("l"),
        (col("l") >= LDiv).as("diverse"))
      .orderBy(col("nation"), col("segment"))

  private val ldivOracle =
    s"""WITH rows AS (
       |  SELECT n.n_name AS nation, c.c_mktsegment AS segment,
       |    CAST(floor(c.c_acctbal/1000)*1000 AS BIGINT) AS sens
       |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
       |cells AS (SELECT nation, segment, sens, count(*) AS cnt
       |          FROM rows GROUP BY 1,2,3)
       |SELECT nation, segment, CAST(sum(cnt) AS BIGINT) AS n,
       |  count(*) AS l, count(*) >= $LDiv AS diverse
       |FROM cells GROUP BY nation, segment
       |ORDER BY nation, segment""".stripMargin

  /** Local differential privacy by randomized response (Warner 1965;
    * the RAPPOR building block): each row reports its sensitive bit
    * (account in debt) TRUTHFULLY with probability p = 3/4, otherwise
    * reports a fair coin — so any single report is deniable
    * (ε = ln((p+(1−p)/2)/((1−p)/2)) = ln 7), yet the population rate
    * is recoverable by debiasing: E[reported] = p·b + (1−p)/2, so
    * b̂ = (r/n − 1/8)/(3/4) = (8r − n)/(6n).
    *
    * Both "random" draws are pure functions of the row key
    * (md5-derived, [[graft.operators.TextOps.h60]]) — the engine-swap
    * determinism rule this repo applies to all sampling: same rows
    * flip on any cluster size, rerun, or engine. The query publishes,
    * per market segment, the noisy count, the debiased estimate, and
    * (as an accuracy audit only possible because this is a test
    * corpus) the true rate it should recover.
    *
    * 100 TB shape: one narrow scan (key, segment, balance-sign) with
    * two codegen'd md5s per row, one low-cardinality aggregate with
    * map-side partials. The debias arithmetic is exact integer →
    * one IEEE division per group — identical across engines.
    */
  def privacyRrEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextOps
    val key = col("c_custkey").cast("string")
    val truth = TextOps.h60(concat(lit("rr1_"), key)) % 4 < 3
    val coin = TextOps.h60(concat(lit("rr2_"), key)) % 2 === 1
    val b = col("c_acctbal") < 0
    val reported = when(truth, b).otherwise(coin)
    Tables.customer(spark, sfDir)
      .select(col("c_mktsegment").as("segment"),
        reported.cast("long").as("rep"), b.cast("long").as("tru"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("rep")).cast("long").as("n_reported"),
        sum(col("tru")).cast("long").as("n_true"))
      .select(col("segment"), col("n"), col("n_reported"),
        round((col("n_reported") * 8 - col("n")).cast("double")
          / (col("n") * 6).cast("double"), 4).as("est_rate"),
        round(col("n_true").cast("double") / col("n").cast("double"), 4)
          .as("true_rate"))
      .orderBy(col("segment"))
  }

  private val rrOracle = {
    import graft.operators.TextOps
    val truth = s"${TextOps.h60Sql("('rr1_' || CAST(c_custkey AS VARCHAR))")} % 4 < 3"
    val coin = s"${TextOps.h60Sql("('rr2_' || CAST(c_custkey AS VARCHAR))")} % 2 = 1"
    s"""WITH r AS (
       |  SELECT c_mktsegment AS segment,
       |    CASE WHEN ($truth) THEN (c_acctbal < 0) ELSE ($coin) END AS rep,
       |    (c_acctbal < 0) AS tru
       |  FROM customer),
       |g AS (
       |  SELECT segment, count(*) AS n,
       |    CAST(sum(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT) AS n_reported,
       |    CAST(sum(CASE WHEN tru THEN 1 ELSE 0 END) AS BIGINT) AS n_true
       |  FROM r GROUP BY segment)
       |SELECT segment, n, n_reported,
       |  round(CAST(n_reported*8 - n AS DOUBLE) / CAST(n*6 AS DOUBLE), 4)
       |    AS est_rate,
       |  round(CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE), 4) AS true_rate
       |FROM g ORDER BY segment""".stripMargin
  }

  /** Right-to-be-forgotten erasure ([[graft.operators.Erasure]]) driven
    * end-to-end inside the hash gate: a day-partitioned events sink,
    * a deterministic deletion list (~9% of users, md5-keyed — the
    * repo's engine-swap sampling rule), targeted partition rewrites,
    * then a per-event-type rollup of what REMAINS — which must
    * hash-match DuckDB aggregating the source with the victims
    * filtered out. The oracle never sees the sink: a surviving victim
    * row, a lost non-victim row, or debris from the rewrite all go
    * red. File-level invariants (untouched months byte-identical,
    * emptied-partition removal) are pinned in ErasureSpec.
    *
    * 100 TB shape: deletion lists are request-scale (broadcast);
    * affected-month discovery is one semi-join projected to the
    * partition column; the rewrite touches O(affected partitions).
    */
  def privacyErasure(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.{Enrich, Erasure, TextOps}
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_erasure"
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    // REBALANCE by the partition value before the day-partitioned
    // write (round 15, guide §6): unclustered, every writer task holds
    // every day and the sink fragments into tasks×days sliver files —
    // which the erase rewrite and the read-back then pay for again.
    ev.hint("rebalance", col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    val victims = ev.select(col("user_id")).distinct()
      .filter(TextOps.h60(
        concat(lit("erase_"), col("user_id").cast("string"))) % 11 === 0)
    Erasure.erase(spark, path, "day", "user_id", victims)
    spark.read.parquet(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(Enrich.exactSum(col("value")), 4).as("value_sum"))
      .orderBy(col("event_type"))
  }

  private val erasureOracle = {
    import graft.operators.TextOps
    val victim = s"${TextOps.h60Sql("('erase_' || CAST(user_id AS VARCHAR))")} % 11 = 0"
    s"""SELECT event_type, count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  round(CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4)
       |    AS value_sum
       |FROM events WHERE NOT ($victim)
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("privacy_kanon", Some(kanonOracle), privacyKanon),
    Q("privacy_ldiversity", Some(ldivOracle), privacyLDiversity),
    Q("privacy_rr_estimate", Some(rrOracle), privacyRrEstimate),
    Q("privacy_erasure", Some(erasureOracle), privacyErasure),
  )
}
