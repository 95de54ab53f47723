package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{GraftPlans, MvCatalog}
import graft.queries.ScaleQueries
import graft.sources.Tables

/** Star-schema face of the summary rewrite: a summary registered over
  * fact ⋈ dims must make the whole join disappear for subsumed
  * aggregates, match ONLY the registered join shape, and decline when
  * any participating table changes.
  */
class MvStarSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("revenue-by-nation serves from the summary with no join in the plan") {
    val served = ScaleQueries.mvRewriteStar(spark, sf)
    val p = plan(served)
    assert(p.contains("graft_mv_star_"), s"summary not scanned:\n$p")
    assert(!p.contains("orders.parquet") && !p.contains("customer.parquet")
      && !p.contains("nation.parquet"), s"base tables still scanned:\n$p")
    assert(!p.contains("Join"), s"a join survived the rewrite:\n$p")
    val base = ScaleQueries.starQuery(ScaleQueries.starJoined(spark, sf))
    assert(served.collect().toSeq == base.collect().toSeq,
      "summary-served star rows differ from the base join-aggregate")
  }

  test("the full-grain group-by over the join is served too") {
    ScaleQueries.mvRewriteStar(spark, sf): Unit // ensure registration
    val serving = servingSessionOf(sf)
    val q = ScaleQueries.starJoined(serving, sf)
      .groupBy(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(!plan(q).contains("Join"), s"full-grain not served:\n${plan(q)}")
    val base = ScaleQueries.starJoined(spark, sf)
      .groupBy(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(q.orderBy("n_name", "o_orderpriority").collect().toSeq ==
      base.orderBy("n_name", "o_orderpriority").collect().toSeq)
  }

  test("a different join shape over the same tables declines") {
    ScaleQueries.mvRewriteStar(spark, sf): Unit
    val serving = servingSessionOf(sf)
    // same three tables, but nation joined on the WRONG key: the
    // canonical key-pair set differs, so the summary must not answer
    val wrong = Tables.orders(serving, sf)
      .join(Tables.customer(serving, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(serving, sf),
        col("c_custkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    assert(plan(wrong).contains("Join"),
      s"summary served a DIFFERENT join shape:\n${plan(wrong)}")
  }

  test("a filter on a non-grain column of any table declines") {
    ScaleQueries.mvRewriteStar(spark, sf): Unit
    val serving = servingSessionOf(sf)
    val f = ScaleQueries.starJoined(serving, sf)
      .filter(col("c_acctbal") > 0)
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    assert(plan(f).contains("Join"),
      s"summary served despite a non-grain dim filter:\n${plan(f)}")
  }

  test("appending to ANY participating table declines until re-registration") {
    // writable copies of the star (nation is 25 rows; orders/customer
    // copied as single-file dirs so appends work)
    val dir = Files.createTempDirectory("graft_mvstar").toString
    def copy(name: String): String = {
      val dst = Paths.get(s"$dir/$name")
      Files.createDirectories(dst)
      Files.copy(Paths.get(s"$sf/$name.parquet"),
        dst.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
      dst.toString
    }
    val (o, c, n) = (copy("orders"), copy("customer"), copy("nation"))
    val s = spark.newSession()
    GraftPlans.ensureMvRewrite(s)
    def joined(ss: SparkSession): DataFrame =
      ss.read.parquet(o)
        .join(ss.read.parquet(c), col("o_custkey") === col("c_custkey"))
        .join(ss.read.parquet(n), col("c_nationkey") === col("n_nationkey"))
    def q(ss: SparkSession): DataFrame =
      joined(ss).groupBy(col("n_name"))
        .agg(count(lit(1)).as("n")).orderBy(col("n_name"))
    val mvPath = s"$dir/summary"
    MvCatalog.register(s, joined(s), ScaleQueries.starGrain,
      ScaleQueries.starAggs, mvPath)
    assert(!plan(q(s)).contains("Join"), "fresh star summary not used")

    // append one row to the DIMENSION (the smallest table): every
    // participant is fingerprinted, so even a dim change declines
    val extra = spark.read.parquet(n).limit(1)
      .withColumn("n_nationkey", col("n_nationkey") + 1000)
    extra.write.mode("append").parquet(n)
    val declined = q(s)
    assert(plan(declined).contains("Join"),
      s"stale star summary served after a dim append:\n${plan(declined)}")
    assert(declined.collect().toSeq == q(spark).collect().toSeq,
      "declined plan no longer matches the base truth")

    MvCatalog.register(s, joined(s), ScaleQueries.starGrain,
      ScaleQueries.starAggs, mvPath)
    val rearmed = q(s)
    assert(!plan(rearmed).contains("Join"), "re-registration did not re-arm")
    assert(rearmed.collect().toSeq == q(spark).collect().toSeq)
  }

  /** The memoized serving session `mvRewriteStar` registered on. */
  private def servingSessionOf(sfDir: String): SparkSession =
    ScaleQueries.mvRewriteStar(spark, sfDir).sparkSession
}
