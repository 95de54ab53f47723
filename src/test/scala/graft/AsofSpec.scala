package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.AsofQueries

class AsofSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics on a hand-built case (≥, latest-wins, no-match dropped)") {
    val orders = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10L, 100.0),
      (1L, Timestamp.valueOf("2024-01-05 00:00:00"), 11L, 200.0),
      (2L, Timestamp.valueOf("2024-01-09 00:00:00"), 20L, 300.0),
    ).toDF("k", "t", "o_orderkey", "o_totalprice")
    val events = Seq(
      (100L, 1L, Timestamp.valueOf("2024-01-03 00:00:00")), // → order 10
      (101L, 1L, Timestamp.valueOf("2024-01-05 00:00:00")), // same instant → 11 (≥)
      (102L, 1L, Timestamp.valueOf("2024-01-09 00:00:00")), // → 11
      (103L, 2L, Timestamp.valueOf("2024-01-08 00:00:00")), // before any → dropped
      (104L, 3L, Timestamp.valueOf("2024-01-08 00:00:00")), // no such key → dropped
    ).toDF("event_id", "k", "t")
    val left = orders.select(col("k"), col("t"), col("o_orderkey"), col("o_totalprice"),
      lit(0).as("is_event"), lit(null).cast("long").as("event_id"))
    val right = events.select(col("k"), col("t"),
      lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"),
      lit(1).as("is_event"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("t"), col("is_event"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = left.unionByName(right)
      .withColumn("asof", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1 && col("asof").isNotNull)
      .select(col("event_id"), col("asof"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((100L, 10L), (101L, 11L), (102L, 11L)))
  }

  test("approx_count_distinct within 5% of exact on real data") {
    // raw HLL estimates (the registry query folds these into booleans)
    val raw = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
    // and the registry query's hash-checked bound flags are all true
    val rows = AsofQueries.approxDistinct(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_5pct"), s"parts bound failed: $r")
      assert(r.getAs[Boolean]("orders_within_5pct"), s"orders bound failed: $r")
    }
  }
}
