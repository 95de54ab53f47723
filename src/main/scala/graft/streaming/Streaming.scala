package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, TTLConfig, TimeMode, Trigger}
import java.sql.Timestamp

/** Structured Streaming form of the reference pipeline.
  *
  * The reference is a 5-minute cron micro-batch
  * (`/root/reference/dags/dag.py:29`): every run scrapes a snapshot,
  * dedups against a cross-run `seen_titles` set (`:72,97-98` — state!),
  * transforms, and appends to Postgres (`:198-225` — at-least-once,
  * duplicates possible on retry). This module maps each of those to
  * the native streaming construct:
  *
  *  - cron period        → `Trigger.ProcessingTime("5 minutes")`
  *  - seen_titles set    → `dropDuplicates` over a watermarked stream
  *                         (bounded state, unlike the reference's
  *                         unbounded in-memory set)
  *  - per-run snapshot   → event-time tumbling `window(ts, "5 minutes")`
  *  - append-only INSERT → idempotent `foreachBatch` upsert keyed by
  *                         (window, batch) — exactly-once effective,
  *                         an improvement the survey calls out (§2.7)
  *
  * The transforms are plain `DataFrame => DataFrame` shared verbatim
  * with the batch engine (`WindowQueries.tumbling` runs the same plan
  * over `spark.read`): one definition, two execution modes — the core
  * Spark-first win over the reference's Airflow-vs-pandas split brain.
  */
object Streaming {

  /** Watermarked 5-minute tumbling aggregates per event type.
    * Works unchanged over a batch frame (watermark is a no-op there).
    */
  def windowedMetrics(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** The `seen_titles` dedup as bounded-state streaming dedup: one row
    * per event_id, state expired past the watermark.
    */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Guaranteed-bounded-state variant: `dropDuplicates` with id-only
    * keys never evicts state (the watermark column is not part of the
    * key, so a key seen once is remembered forever — unbounded state
    * growth on a 100 TB/day stream). `dropDuplicatesWithinWatermark`
    * (Spark 3.5+) keys on the id alone but expires each entry once the
    * watermark passes its event time, deduplicating retries whose
    * RE-EMITTED timestamps differ (a (id, ts) composite key would miss
    * those) while keeping state proportional to the watermark window,
    * not the key cardinality.
    */
  def dedupStreamWithinWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** A user session (gap-based) assembled with custom state. */
  final case class Session(user_id: Long, n_events: Int,
                           start: Timestamp, end: Timestamp)
  final case class Evt(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: Double)

  final case class UserRunningCount(user_id: Long, n_total: Long)

  /** Spark 4 arbitrary stateful processing v2: a `StatefulProcessor`
    * with typed `ValueState`, driven through
    * `KeyValueGroupedDataset.transformWithState`. Emits each user's
    * CUMULATIVE event count every micro-batch that touches the user
    * (Update mode). Requires the RocksDB state store provider — at
    * scale that is also the right provider (state spills off-heap,
    * changelog checkpoints). TTL left NONE here; production counters
    * set a TTLConfig so abandoned keys age out instead of growing
    * state forever.
    */
  class RunningCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Evt, UserRunningCount] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long](
        "count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[Evt],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunningCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(UserRunningCount(key, n))
    }
  }

  /** Running per-user counts over a stream via [[RunningCountProcessor]]. */
  def runningCounts(events: Dataset[Evt]): Dataset[UserRunningCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Custom-state sessionization via `flatMapGroupsWithState`: closes a
    * session when the event-time gap exceeds `gapMs`. Demonstrates the
    * arbitrary-state API (`GroupState` + event-time timeout) the
    * reference has no analog for.
    */
  def sessionize(events: Dataset[Evt], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Evt], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove(); Iterator.single(s)
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
                  cur = Some(s.copy(n_events = s.n_events + 1, end = e.ts))
                case Some(s) =>
                  closed ::= s
                  cur = Some(Session(user, 1, e.ts, e.ts))
                case None =>
                  cur = Some(Session(user, 1, e.ts, e.ts))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end.getTime + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join: each "click" event matched to the
    * same user's "view" events from the preceding `windowMinutes`.
    * Both sides are watermarked so the join state is BOUNDED — Spark
    * drops buffered rows once the watermark passes the interval (the
    * property that keeps a 100 TB/day stream-stream join from
    * accumulating unbounded state). The reference has no streaming
    * join at all; its analog would be a full re-scrape + batch merge.
    */
  def intervalJoin(clicks: DataFrame, views: DataFrame,
                   windowMinutes: Int = 10): DataFrame = {
    val c = clicks.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"))
    c.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("view_ts") <= col("click_ts"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Stream-static dimension enrichment: every micro-batch hash-joins
    * against a BATCH dimension table — the standard "enrich events
    * with the customer record" pattern. The static side broadcasts
    * (dimension tables are small by construction), so each micro-batch
    * is a map-only stage: no shuffle of the stream, no join state at
    * all (unlike stream-stream joins the static side needs no
    * watermark). Spark re-plans the static side per micro-batch, so a
    * dimension refresh (new parquet files) is picked up without
    * restarting the query.
    */
  def dimEnriched(events: DataFrame, customerDim: DataFrame): DataFrame =
    events.join(
      broadcast(customerDim.select(col("c_custkey"), col("c_mktsegment"))),
      col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))

  /** Windowed distinct-user estimates via the SAME KMV sketch the
    * batch engine uses ([[graft.functions.KmvDistinct]]): the
    * aggregator's mergeable O(k) buffer is exactly what the streaming
    * state store needs — each window holds one ≤k-array, micro-batches
    * merge partials into it, and the estimate finalizes when the
    * watermark closes the window. One sketch definition, three
    * execution contexts (batch, shuffle partials, streaming state).
    */
  def distinctUsersPerWindow(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val kmv = udaf(graft.functions.KmvDistinct)
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), h.as("uh"))
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(round(kmv(col("uh")), 4).as("est_users"))
      .select(col("window.start").as("w_start"), col("est_users"))
  }

  /** Launch the windowed pipeline with the reference's cadence and an
    * idempotent parquet sink: `foreachBatch` writes each micro-batch
    * to a batch-id-named directory (rerun of a batch overwrites, never
    * duplicates — the exactly-once improvement over `dag.py:198-225`).
    */
  def startPipeline(events: DataFrame, checkpoint: String, outDir: String,
                    trigger: Trigger = Trigger.ProcessingTime("5 minutes")): StreamingQuery =
    windowedMetrics(events).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()

  // ---- streaming corpus curation (round 6) ------------------------------

  /** Synthetic-but-deterministic event time for the documents corpus:
    * ts = 2026-01-01T00:00:00Z + doc_id·7 s (~43 docs per 5-minute
    * window). The corpus has no ingest timestamp, and BOTH engines
    * must derive the identical instant from doc_id for the batch twin
    * to hash-gate — integer arithmetic, no timezone parsing.
    */
  val DocEpoch = 1767225600L // 2026-01-01T00:00:00Z
  def withDocTime(docs: DataFrame): DataFrame =
    docs.withColumn("ts", timestamp_seconds(lit(DocEpoch) + col("doc_id") * 7))

  /** End-to-end streaming curation: exact dedup → quality filter →
    * windowed corpus-mix report, as ONE streaming query with two
    * stateful operators (Spark 4 chained-stateful support).
    *
    *  - dedup: `dropDuplicatesWithinWatermark` keyed on
    *    (content md5, source, 5-minute bucket) — the retransmission
    *    guard of an ingest pipeline. State is bounded by the
    *    watermark horizon, NOT by corpus cardinality (the property
    *    that keeps this viable on a 100 TB/day stream); corpus-GLOBAL
    *    dedup remains the batch `dedup_*` family's job. Keying on
    *    (hash, source, bucket) makes every surviving row identical in
    *    all report-relevant columns, so the downstream report is
    *    provably invariant to WHICH duplicate the state store keeps —
    *    that is what lets the identical chain run as a batch query
    *    (where the survivor is arbitrary) and still hash-gate.
    *  - quality: [[graft.operators.TextOps.qualityReason]] == "keep" —
    *    the same codegen'd rule set as the batch `docs_filter_funnel`.
    *  - report: per (5-minute window, source) doc/char counts — the
    *    corpus-mix telemetry a curation stream feeds back to sampling.
    *
    * Runs over a batch frame too (watermark is a no-op; the dedup
    * switches to plain `dropDuplicates` on the same keys, which the
    * invariance argument makes report-equivalent): one definition,
    * two execution modes — `stream_curation_mix` is this plan run in
    * batch mode under the DuckDB oracle.
    */
  def curatedMix(docs: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val keyed = docs
      .withWatermark("ts", watermark)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("w_tag", expr("CAST(ts AS LONG) div 300"))
    val dedupKeys = Seq("content_hash", "source", "w_tag")
    // dropDuplicatesWithinWatermark refuses batch frames outright, so
    // batch mode uses plain dropDuplicates on the same keys — by the
    // survivor-invariance argument above the two produce the identical
    // report, which is precisely what lets one definition serve both.
    val deduped =
      if (docs.isStreaming) keyed.dropDuplicatesWithinWatermark(dedupKeys)
      else keyed.dropDuplicates(dedupKeys)
    deduped
      .filter(graft.operators.TextOps.qualityReason(col("text")) === "keep")
      .groupBy(window(col("ts"), "5 minutes"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_total"))
      .select(col("window.start").cast("long").as("w_start"), col("source"),
        col("n_docs"), col("chars_total"))
  }

  /** [[curatedMix]] as a launched streaming query with the same
    * idempotent batch-id-keyed parquet sink as [[startPipeline]] —
    * checkpoint-restartable, rerun-of-a-batch overwrites.
    */
  def startCurationPipeline(docs: DataFrame, checkpoint: String, outDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes")): StreamingQuery =
    curatedMix(docs).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()

  /** Incremental SCD2 maintenance over a change stream — the
    * streaming form of [[graft.operators.Scd2.history]] (incremental
    * view maintenance, the pattern a warehouse uses so the dimension
    * is always current without nightly full rebuilds).
    *
    * Per micro-batch:
    *  1. idempotent append of the batch's raw changes to the
    *     accumulated change log at `accDir`, PARTITIONED BY
    *     (bucket, slice) — a replayed batch dynamic-overwrites
    *     exactly its own partitions ([[Scd2Log.appendSlice]]);
    *  2. find the state BUCKETS (`user_id % 16`) containing touched
    *     users — history is per-user, so only their buckets can
    *     change;
    *  3. rebuild history for those buckets only, reading ONLY the
    *     touched buckets' log directories ([[Scd2Log.touchedLog]]
    *     builds the read from explicit paths — untouched buckets'
    *     files are never listed or opened, so per-batch read work is
    *     O(touched log), not O(total history));
    *  4. DYNAMIC partition overwrite of `stateDir`: only the rebuilt
    *     bucket partitions are replaced; untouched buckets' files are
    *     not rewritten (or even read);
    *  5. compact any touched bucket that exceeds `compactAfter` log
    *     slices into one slice ([[Scd2Log.compact]]), so file-listing
    *     cost per bucket is bounded for the stream's lifetime.
    * Per-batch work is thus proportional to touched buckets, not
    * dimension size or stream age — at 100 TB the bucket count scales
    * up and a batch touching k users reads/rewrites ≤ k partitions.
    * Restart-safe twice over: appends are idempotent per (bucket,
    * slice), and the rebuild dedupes the log on `event_id`, so even a
    * crash inside compaction (slice written, inputs not yet deleted)
    * cannot corrupt state. [[Scd2Log.verifyStreamIdentity]] fails
    * fast if `accDir` belongs to a different checkpoint lineage
    * (fresh checkpoint ⇒ batch ids restart at 0 ⇒ silent clobber).
    */
  def maintainScd2(events: DataFrame, checkpoint: String,
      accDir: String, stateDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      compactAfter: Int = Scd2Log.DefaultCompactAfter): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        Scd2Log.verifyStreamIdentity(spark, checkpoint, accDir)
        batch.persist()
        Scd2Log.appendSlice(
          batch.withColumn("bucket", graft.operators.Scd2.bucketOf(col("user_id"))),
          accDir, batchId)
        val touched = batch
          .select(graft.operators.Scd2.bucketOf(col("user_id")).as("bucket"))
          .distinct().collect().map(_.getLong(0)).toSeq
        batch.unpersist()
        if (touched.nonEmpty) {
          val acc = Scd2Log.touchedLog(spark, accDir, touched)
          val rebuilt = graft.operators.Scd2.history(acc.drop("bucket"))
            .withColumn("bucket", graft.operators.Scd2.bucketOf(col("user_id")))
          Scd2Log.withDynamicOverwrite(spark) {
            rebuilt.write.mode("overwrite").partitionBy("bucket").parquet(stateDir)
          }
          Scd2Log.compact(spark, accDir, touched, batchId, compactAfter)
        }
      }
      .start()

  /** Per-event-type running metrics as a MERGEABLE delta: counts plus
    * an exact-decimal value sum, so `prev ⊎ delta` re-aggregated gives
    * the same table as recomputing from all events — no O(history)
    * re-read per batch.
    */
  def metricsDelta(batch: DataFrame): DataFrame =
    batch.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,4)")).as("value_sum"))

  /** Streaming sink that publishes a VERSIONED SNAPSHOT of the running
    * metrics table per micro-batch, through the
    * [[graft.operators.Snapshots]] commit protocol — so a reader
    * polling the table always sees one complete, committed version,
    * never a half-written micro-batch result (the streaming analog of
    * what Delta's transaction log gives a streaming sink).
    *
    * Exactly-once without a transaction payload: the version is a
    * DETERMINISTIC function of the batch (v = batchId + 1), so replay
    * after any crash re-claims the same version —
    *  - committed already (crash after marker, before checkpoint
    *    advance): the marker exists, the batch is SKIPPED;
    *  - data written but unmarked (crash between write and marker):
    *    the merge recomputes deterministically from the same batch +
    *    last COMMITTED version, overwrites the debris, commits.
    * Per-batch work is O(batch) + O(|metrics table|) — the merge
    * reads the previous version (bounded by event-type cardinality),
    * never the event history. Compose with [[Snapshots.vacuum]] to
    * bound version count; time travel gives per-batch-boundary
    * metric history for free.
    */
  def publishVersionedMetrics(events: DataFrame, checkpoint: String,
      table: String,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      keepVersions: Int = Int.MaxValue): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val v = batchId + 1
        if (!graft.operators.Snapshots.committedVersions(spark, table)
            .contains(v)) {
          val delta = metricsDelta(batch)
          val merged = graft.operators.Snapshots.latestVersion(spark, table) match {
            case Some(pv) =>
              graft.operators.Snapshots.readVersion(spark, table, pv)
                .unionByName(delta)
                .groupBy(col("event_type"))
                .agg(sum(col("n_events")).as("n_events"),
                  sum(col("value_sum")).as("value_sum"))
            case None => delta
          }
          graft.operators.Snapshots.publishAt(spark, table, v, merged): Unit
          retain(spark, table, keepVersions)
        }
      }
      .start()

  /** Retention for the versioned-snapshot sinks: without it, version
    * count grows one-per-micro-batch forever — the same unbounded-
    * growth class as the round-6 SCD2 change-log flaw, preempted here.
    * Safe under the exactly-once replay protocol: vacuum never touches
    * the max committed version (keep ≥ 1), and a crash replay only
    * ever re-claims the LAST batch's version, which retention kept.
    */
  private def retain(spark: org.apache.spark.sql.SparkSession,
      table: String, keepVersions: Int): Unit =
    if (keepVersions != Int.MaxValue)
      graft.operators.Snapshots.vacuum(spark, table, keepVersions)

  /** Streaming corpus-drift monitor: maintains the (source, word)
    * count table incrementally — one versioned snapshot per
    * micro-batch of arriving documents, through the same
    * exactly-once protocol as [[publishVersionedMetrics]] (version =
    * batchId + 1; replay of a committed batch is a no-op, replay of a
    * crashed one deterministically overwrites its debris) — so the
    * per-source KL drift report
    * ([[graft.operators.Drift.klFromCounts]], the IDENTICAL algebra
    * the batch `text_kl_drift` query hash-gates against DuckDB) is
    * servable at every batch boundary, and time travel replays drift
    * history for free.
    *
    * Why snapshot COUNTS and not the report: counts are mergeable
    * state (order-free addition — prev ⊎ delta re-aggregated equals
    * a full recompute, which the spec pins against the batch twin);
    * KL is a ratio of totals and is NOT mergeable, so it derives
    * from the counts at read time, at vocabulary cost. Per-batch
    * work is O(batch tokens + vocab): the merge reads the previous
    * snapshot (vocabulary-sized, MBs when the corpus is TBs), never
    * the document history.
    */
  def monitorDrift(docs: DataFrame, checkpoint: String, table: String,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      keepVersions: Int = Int.MaxValue): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val v = batchId + 1
        if (!graft.operators.Snapshots.committedVersions(spark, table)
            .contains(v)) {
          val delta = graft.operators.Drift.docCounts(batch)
          val merged = graft.operators.Snapshots.latestVersion(spark, table) match {
            case Some(pv) =>
              graft.operators.Drift.mergeCounts(
                graft.operators.Snapshots.readVersion(spark, table, pv), delta)
            case None => delta
          }
          graft.operators.Snapshots.publishAt(spark, table, v, merged): Unit
          retain(spark, table, keepVersions)
        }
      }
      .start()

  /** The drift report served from the latest committed snapshot —
    * what a dashboard poll reads between micro-batches.
    */
  def latestDriftReport(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    graft.operators.Drift.klFromCounts(
      graft.operators.Snapshots.readLatest(spark, table))
}
