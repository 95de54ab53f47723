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
