package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.{AsofJoinExec, GraftPlans}
import graft.queries.AsofQueries

/** The native whole-operator as-of join (AsofJoin logical node →
  * AsofJoinStrategy → AsofJoinExec sort-merge merge).
  */
class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDf = Seq(
    (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10L, 100.0),
    (1L, Timestamp.valueOf("2024-01-05 00:00:00"), 11L, 200.0),
    (2L, Timestamp.valueOf("2024-01-09 00:00:00"), 20L, 300.0),
  ).toDF("k", "t", "o_orderkey", "o_totalprice")

  private def eventsDf = Seq(
    (100L, 1L, Timestamp.valueOf("2024-01-03 00:00:00")), // → order 10
    (101L, 1L, Timestamp.valueOf("2024-01-05 00:00:00")), // same instant → 11 (≥)
    (102L, 1L, Timestamp.valueOf("2024-01-09 00:00:00")), // → 11
    (103L, 2L, Timestamp.valueOf("2024-01-08 00:00:00")), // before any → dropped
    (104L, 3L, Timestamp.valueOf("2024-01-08 00:00:00")), // no such key → dropped
  ).toDF("event_id", "user_id", "ts")

  test("native as-of: ≥ semantics, latest-wins, no-match dropped") {
    val out = GraftPlans.asofJoin(eventsDf, ordersDf, "user_id", "ts", "k", "t")
      .select(col("event_id"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((100L, 10L), (101L, 11L), (102L, 11L)))
  }

  test("native as-of: null keys and null times never match") {
    val right = Seq((Some(1L), Some(1L), 10L)).toDF("k", "t", "payload")
    val left = Seq(
      (1L, Option(1L), Option(5L)),   // matches
      (2L, None, Option(5L)),         // null key → dropped
      (3L, Option(1L), None),         // null time → dropped
    ).toDF("id", "k", "t")
    val out = GraftPlans.asofJoin(left, right, "k", "t", "k", "t")
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(out == Seq(1L))
  }

  test("native as-of matches the window form on real data (row-for-row)") {
    val native = AsofQueries.joinAsofNative(spark, sf)
    val window = AsofQueries.joinAsof(spark, sf)
    assert(native.schema == window.schema)
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty,
      "native and window as-of forms disagree")
  }

  test("native as-of plans AsofJoinExec with clustered exchanges, no nested loop") {
    val p = AsofQueries.joinAsofNative(spark, sf).queryExecution.executedPlan
    val s = p.toString
    assert(s.contains("AsofJoin"), s"no AsofJoinExec in plan:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$s")
    // both children hash-shuffled on their keys (co-partitioned merge)
    assert(s.contains("hashpartitioning(user_id") && s.contains("hashpartitioning(k"),
      s"children not clustered on join keys:\n$s")
  }

  test("left filter pushes through AsofJoin into the parquet scan (custom Rule)") {
    // filter applied ABOVE the custom join node: without
    // PushFilterThroughAsofJoin it would stay above AsofJoin (built-in
    // pushdown can't see through unknown nodes) and the events scan
    // would read everything
    val filtered = AsofQueries.joinAsofNative(spark, sf)
      .filter(col("user_id") < 50)
    val opt = filtered.queryExecution.optimizedPlan
    // after the rule fires, no Filter remains anywhere ABOVE the
    // AsofJoin node (it has moved to the join's left child)
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val filterAboveJoin = opt.collectFirst {
      case fl: Filter if fl.collectFirst { case a: graft.plans.AsofJoin => a }.isDefined
        && fl.condition.references.exists(_.name == "user_id") => fl
    }
    assert(filterAboveJoin.isEmpty,
      s"left-side filter not pushed below AsofJoin:\n$opt")
    val scans = filtered.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val ev = scans.find(_.contains("event_id")).getOrElse(
      fail(s"no events scan leaf:\n${scans.mkString("\n")}"))
    assert(ev.contains("LessThan(user_id,50)"),
      s"filter did not reach the events scan:\n$ev")
    // semantics unchanged: push-then-join == join-then-filter
    val reference = AsofQueries.joinAsofNative(spark, sf)
      .collect().count(_.getAs[Long]("user_id") < 50)
    assert(filtered.count() == reference,
      "pushed plan returns different rows than post-join filtering")
  }

  test("right-side filters are NOT pushed through AsofJoin (semantics guard)") {
    // a post-join predicate on a RIGHT column must reject pairs whose
    // latest row fails it — pushing it down would instead re-match
    // among survivors. Guard: rule leaves right-referencing conjuncts
    // above the join.
    val right = Seq(
      (1L, 1L, 10L), // t=1, payload 10
      (1L, 5L, -1L), // t=5, payload -1 (latest for probes at t>=5)
    ).toDF("k", "t", "payload")
    val left = Seq((100L, 1L, 9L)).toDF("id", "k", "t")
    val joined = GraftPlans.asofJoin(
        left, right.select(col("k").as("rk"), col("t").as("rt"), col("payload")),
        "k", "t", "rk", "rt")
      .filter(col("payload") > 0)
    // latest row at t<=9 is (5, -1): the pair must be REJECTED, not
    // re-matched to (1, 10)
    assert(joined.count() == 0L,
      "right-side filter was pushed through the as-of join (wrong semantics)")
  }

  test("merge is exact across many keys/ties against a groupBy oracle") {
    // synthetic: 200 keys x 10 right rows, 600 left probes
    val right = (0 until 2000).map { i =>
      (i % 200L, (i / 200L) * 10L, i.toLong)
    }.toDF("k", "t", "rid")
    val left = (0 until 600).map { i =>
      (i % 200L, (i % 97).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val native = GraftPlans.asofJoin(left, right, "k", "t", "k", "t")
      .select(col("lid"), col("rid"))
    // oracle: max rid among right rows with same k and rt <= lt
    // (rid increases with t within a key, so argmax-by-t = max rid)
    val oracle = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"))
      .groupBy(col("l.lid").as("lid"))
      .agg(max(col("r.rid")).as("rid"))
    assert(native.exceptAll(oracle).isEmpty && oracle.exceptAll(native).isEmpty,
      "native as-of disagrees with the pairwise-max oracle")
  }
}
