package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.plans.{MvCatalog, MvShape, RegisteredMv}

/** Streaming incremental maintenance of a summary table (the
  * [[graft.plans.MvRewriteRule]] serving artifact) — the warehouse's
  * "materialized view refresh" without ever re-scanning the fact.
  *
  * The insight that makes this IVM trivial: the summary IS a
  * mergeable-partial set. The rewrite re-merges stored partials at
  * query time (SUM of sums, SUM of counts, MIN of mins), so the
  * summary may hold ANY number of partial rows per grain — maintenance
  * is therefore just "append this batch's grain-level partials",
  * a map-side-combinable aggregate of the BATCH, never of the
  * accumulated fact. At 100 TB the refresh cost is O(batch), the
  * classic incremental-view-maintenance shape for distributive
  * aggregates (sum/count/min/max under append-only streams; MIN/MAX
  * stop being maintainable under deletes, which is exactly the
  * textbook boundary and documented here).
  *
  * Layout: `(p, slice)` where `p` = grain-hash bucket (bounded fan-in
  * for compaction) and `slice` = the batch id, the [[Scd2Log]] unit of
  * idempotent replay — a replayed batch dynamic-overwrites exactly its
  * own slice. Each partial row is KEYED by `sid` (= its slice tag):
  * the [[RagIndex]] stats lesson — a SUM partial is only crash-safe as
  * a SET of keyed rows, because duplicated anonymous partials inflate
  * a sum where keyed rows dedupe.
  *
  * The serving handoff is [[adoptMaintained]]: it (a) REPAIRS the one
  * place duplicates can outlive a crash (compaction dies between
  * writing the folded slice and deleting its inputs) by re-running the
  * same keyed fold — idempotent, converges under repeated crashes —
  * and (b) re-registers the summary against the fact's CURRENT
  * fingerprint. Between a fact append and the next adopt, the
  * freshness guard declines the rewrite and queries fall back to the
  * base scan: stale serving is impossible by construction, it is
  * merely slower.
  */
object MvMaintain {

  /** grain-hash partition buckets of the summary layout */
  val NB = 16

  /** Sentinel batch id for the adopt-time repair fold: `slice=c-1` can
    * collide only with a previous repair, which the fold handles the
    * same way compaction replay does (its own output is among its
    * inputs).
    */
  val RepairId = -1L

  /** One micro-batch's grain-level partial rows. */
  def partialOf(batch: DataFrame, grain: Seq[String],
      shapes: Seq[MvShape], sid: String): DataFrame = {
    val aggCols = shapes.map(s => expr(s.sql).as(s.stored))
    batch.groupBy(grain.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("sid", lit(sid))
      .withColumn("p", pmod(xxhash64(grain.map(col): _*), lit(NB)))
  }

  /** Idempotent application of one batch: append the keyed partials as
    * this batch's slice, then bound the touched buckets' slice counts.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      mvDir: String, grain: Seq[String], shapes: Seq[MvShape],
      compactAfter: Int = Scd2Log.DefaultCompactAfter): Unit = {
    val part = partialOf(batch, grain, shapes, s"b$batchId")
      .localCheckpoint(true) // the touched-bucket list reuses it below
    Scd2Log.withDynamicOverwrite(spark) {
      part.withColumn("slice", lit(s"b$batchId"))
        .write.mode("overwrite").partitionBy("p", "slice").parquet(mvDir)
    }
    // bounded metadata: touched buckets ≤ NB
    val touched = part.select(col("p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    Scd2Log.compact(spark, mvDir, touched, batchId, compactAfter,
      partCol = "p", keyCols = grain :+ "sid")
  }

  /** Launch the maintenance stream over `factStream`.
    *
    * `prepare` turns each raw fact micro-batch into the frame the
    * shapes aggregate over — identity for a single-table summary; for
    * a STAR summary it joins the batch to the dimension tables
    * (fact-delta ⋈ dims is the textbook star IVM: new fact rows join
    * CURRENT dims, a broadcast join of O(batch) cost). Dims are
    * static between registrations: every dim file is part of the
    * registration's fingerprint, so a dim change makes serving decline
    * until a re-register (the batch rebuild) — the correct boundary,
    * because incremental maintenance under dimension churn would need
    * retro-propagation into historical partials (the SCD2 problem,
    * deliberately out of scope here).
    */
  def maintain(factStream: DataFrame, checkpoint: String, mvDir: String,
      grain: Seq[String], shapes: Seq[MvShape],
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      compactAfter: Int = Scd2Log.DefaultCompactAfter,
      prepare: DataFrame => DataFrame = identity): StreamingQuery =
    factStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        Scd2Log.verifyStreamIdentity(spark, checkpoint, mvDir, "p=")
        applyBatch(spark, prepare(batch), batchId, mvDir, grain, shapes,
          compactAfter)
      }
      .start()

  /** Serving handoff: repair any compaction-crash duplicates, then
    * re-register the maintained summary against the fact's current
    * fingerprint on `session`. Call after the maintainer has processed
    * the fact's landed files; between fact changes and adopts the
    * rewrite declines (correct, just unaccelerated).
    */
  def adoptMaintained(session: SparkSession, fact: DataFrame,
      grain: Seq[String], shapes: Seq[MvShape],
      mvDir: String): RegisteredMv = {
    val mv = session.read.parquet(mvDir)
    val key = grain :+ "sid"
    val dups = mv.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .limit(1).count()
    if (dups > 0) {
      // a compaction crashed between fold-write and input-delete;
      // re-running the keyed fold over every EXISTING bucket is the
      // idempotent repair (cost O(summary) = O(grain cardinality),
      // never O(fact))
      val root = new org.apache.hadoop.fs.Path(mvDir)
      val fs = root.getFileSystem(session.sparkContext.hadoopConfiguration)
      val buckets = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("p="))
        .map(_.getPath.getName.stripPrefix("p=").toLong)
      Scd2Log.compact(session, mvDir, buckets,
        RepairId, compactAfter = 0, partCol = "p", keyCols = key)
    }
    MvCatalog.adopt(session, fact, grain, shapes, mvDir)
  }

  /** The maintained summary, finished to one row per grain the way the
    * rewrite's re-merge sees it — the spec's equivalence face.
    */
  def merged(spark: SparkSession, mvDir: String, grain: Seq[String],
      shapes: Seq[MvShape]): DataFrame = {
    val mergeCols = shapes.map { s =>
      val fn = s.key.takeWhile(_ != '|') match {
        case "sum" | "count" => "sum"
        case other => other // min|max partials re-min/max
      }
      expr(s"$fn(${s.stored})").as(s.stored)
    }
    spark.read.parquet(mvDir)
      .dropDuplicates(grain :+ "sid")
      .groupBy(grain.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }
}
