package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: build versioned validity
  * intervals from a change stream, and maintain them incrementally.
  *
  * Plays the role the reference's Postgres dimension tables would if
  * the reference tracked attribute history (it INSERT-appends and
  * overwrites instead — `/root/reference/dags/dag.py:203-225`); the
  * SCD2 form is what a warehouse keeps so joins can ask "what was the
  * value AT the fact's timestamp" (`scd2_lookup`).
  *
  * [[history]] is the batch build (one hash shuffle on the dimension
  * key — change-detect `lag`, `row_number` versioning and `valid_to`
  * `lead` all share the (key, time) partitioning; plan-asserted in
  * QueryPlanSpec). [[graft.streaming.Streaming.maintainScd2]] is the
  * incremental form over a change stream.
  */
object Scd2 {

  /** Versioned history from a change-record DataFrame: rows with
    * (`user_id`, `event_type`, `ts`, `event_id`); consecutive
    * duplicate attribute values are no-ops and dropped. Returns
    * (user_id, version, attr, valid_from, valid_to, is_current) —
    * UNSORTED; callers order for presentation.
    */
  def history(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("version", row_number().over(byTime))
      .withColumn("valid_to", lead(col("ts"), 1).over(byTime))
      .select(col("user_id"), col("version"), col("event_type").as("attr"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** State-table bucket of a dimension key: incremental maintenance
    * rewrites only the buckets containing changed keys (dynamic
    * partition overwrite), so per-batch write work is proportional to
    * touched buckets, not the dimension size.
    */
  val NBuckets = 16
  def bucketOf(userId: Column): Column = pmod(userId, lit(NBuckets))
}
