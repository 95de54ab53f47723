package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime re-plan that saves a 100 TB
  * join when one key holds a disproportionate share of the rows (the
  * OTHER skew strategy next to the explicit salting in
  * `join_skew_salted`: salting is the writer-side fix you design in,
  * AQE splitting is the engine-side fix you get for free when a skew
  * you didn't predict shows up at runtime).
  *
  * Runs in a `newSession()` of the shared context: skew detection
  * triggers on partition SIZES, so the thresholds are lowered to fire
  * at test scale, and auto-broadcast is disabled to force a sort-merge
  * join — all runtime SQL confs, isolated to this session (a
  * `getOrCreate`+`stop` here would kill the suite-shared context).
  */
class AdaptiveSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge-join partition at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 8)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    s.conf.set("spark.sql.adaptive.enabled", true)
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
    // fire at kilobyte scale instead of the 256 MB production default
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", 2)
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", false)
    // the post-join aggregation re-shuffles regardless, but the
    // cost-check conservatively counts that as an "extra" shuffle
    // and skips the split — force it (at 100 TB the split is the win)
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", true)

    // left: 100k rows, 95% on key 0 — one shuffle partition dwarfs the
    // rest; right: uniform small dim (SMJ only because auto-broadcast
    // is off)
    val left = s.range(0, 100000)
      .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 50)
        .as("k"), col("id").as("v"))
    val right = s.range(0, 50).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    val joined = left.join(right, "k").groupBy(col("name"))
      .agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    assert(rows.map(_.getLong(1)).sum == 100000L)
    // after execution the adaptive plan is final; the skewed SMJ
    // partition must have been split (marked `skew=true` in the plan)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark/split the skewed join partition:\n$finalPlan")
  }
}
