package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._
import graft.queries.Registry

/** Plan-fingerprint regression gate (round 7, the verdict's #3).
  *
  * Rounds 5-6 repeatedly changed plan SHAPES while hash-matching
  * outputs (window-sort → map-side `max_by` killed a 39.6 GB spill;
  * WindowGroupLimit pushdowns; broadcast-join placements). Correctness
  * gates cannot see those regressions — a silent revert to the spilling
  * shape would still hash-match. This spec pins a canonical digest of
  * every headline query's physical plan against a checked-in snapshot
  * (`src/test/resources/plan-fingerprints.tsv`).
  *
  * The digest is the operator tree rendered by [[PlanGateSpec.shape]]:
  * node class names (no ids, no expr-ids, no paths) plus exactly the
  * properties the gate exists to guard — join type + build side,
  * exchange partitioning class, aggregate modes (partial vs final is
  * the map-side-combine evidence), and WholeStageCodegen boundaries.
  *
  * Update ritual (PLANS.md "plan-fingerprint gate"): when a plan change
  * is INTENTIONAL, rerun with `SPARK_GRAFT_UPDATE_PLANS=1 sbt "testOnly
  * graft.PlanGateSpec"` — the spec rewrites the snapshot and fails once
  * with a diff summary so the change lands in the same commit,
  * reviewed, never silently.
  *
  * AQE is disabled in this spec's session: fingerprints pin the
  * compile-time plan (AQE re-plans at runtime from the same initial
  * plan, so the initial shape is the stable, comparable artifact).
  */
class PlanGateSpec extends SparkSpec {

  private val snapshotPath = Paths.get("src/test/resources/plan-fingerprints.tsv")

  // derived session: same context and catalog, AQE off for stable shapes
  private lazy val planSession: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def shape(p: SparkPlan): String = p match {
    case a: AdaptiveSparkPlanExec => shape(a.inputPlan)
    case _ =>
      val label = p match {
        case j: BroadcastHashJoinExec => s"BroadcastHashJoin[${j.joinType},${j.buildSide}]"
        case j: ShuffledHashJoinExec => s"ShuffledHashJoin[${j.joinType},${j.buildSide}]"
        case j: SortMergeJoinExec => s"SortMergeJoin[${j.joinType}]"
        case j: BroadcastNestedLoopJoinExec => s"BroadcastNestedLoopJoin[${j.joinType}]"
        case e: ShuffleExchangeExec =>
          s"Exchange[${e.outputPartitioning.getClass.getSimpleName}]"
        case _: BroadcastExchangeExec => "BroadcastExchange"
        case h: HashAggregateExec =>
          s"HashAggregate[${h.aggregateExpressions.map(_.mode.toString).distinct.sorted.mkString("+")}]"
        case other => other.getClass.getSimpleName.stripSuffix("Exec")
      }
      if (p.children.isEmpty) label
      else label + "(" + p.children.map(shape).mkString(",") + ")"
  }

  private def fingerprints(): Seq[(String, String)] = {
    // fingerprint from a COLD cache: the dedup family persists shared
    // frames in the JVM-wide CacheManager, and an InMemoryRelation
    // cached by an EARLIER suite (suites run sequentially in the
    // forked JVM; e.g. QueryPlanSpec builds every query first)
    // carries that build's output partitioning — which decides
    // whether the aggregate above needs an Exchange, so the same
    // query fingerprints differently warm vs cold (observed:
    // dedup_simhash 1-stage fused cold, 2-stage exchanged warm).
    // Cold is the deterministic, run-order-independent state.
    planSession.catalog.clearCache()
    Registry.headline.map { name =>
      name -> shape(
        SparkEntry.queries(name)(planSession, sf).queryExecution.executedPlan)
    }
  }

  private def readSnapshot(): Map[String, String] =
    if (!Files.exists(snapshotPath)) Map.empty
    else new String(Files.readAllBytes(snapshotPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains("\t")).map { l =>
        val Array(n, s) = l.split("\t", 2); n -> s
      }.toMap

  test("headline physical plans match the checked-in fingerprints") {
    val got = fingerprints()
    if (sys.env.contains("SPARK_GRAFT_UPDATE_PLANS")) {
      val old = readSnapshot()
      Files.createDirectories(snapshotPath.getParent)
      Files.write(snapshotPath,
        got.map { case (n, s) => s"$n\t$s" }.mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
      val changed = got.filter { case (n, s) => old.get(n).exists(_ != s) }
      val added = got.filterNot { case (n, _) => old.contains(n) }
      fail(
        s"snapshot updated (${changed.size} changed, ${added.size} new) — " +
          "review the diff and commit plan-fingerprints.tsv with the change:\n" +
          changed.map { case (n, s) => s"  $n:\n    was ${old(n)}\n    now $s" }
            .mkString("\n"))
    } else {
      val want = readSnapshot()
      assert(want.nonEmpty,
        "no plan snapshot — run SPARK_GRAFT_UPDATE_PLANS=1 testOnly graft.PlanGateSpec")
      val missing = got.collect { case (n, _) if !want.contains(n) => n }
      assert(missing.isEmpty,
        s"headline queries without a pinned plan: $missing — " +
          "rerun with SPARK_GRAFT_UPDATE_PLANS=1 and commit the snapshot")
      val drifted = got.collect {
        case (n, s) if want(n) != s => s"$n:\n  pinned ${want(n)}\n  got    $s"
      }
      assert(drifted.isEmpty,
        "physical plan drift (intentional? SPARK_GRAFT_UPDATE_PLANS=1 " +
          "rewrites the snapshot):\n" + drifted.mkString("\n"))
      // and no stale entries for queries that left the headline set
      val stale = want.keySet -- got.map(_._1).toSet
      assert(stale.isEmpty, s"stale fingerprint entries: $stale")
    }
  }
}
