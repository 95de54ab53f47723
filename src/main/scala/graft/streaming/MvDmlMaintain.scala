package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.{DeletionVectors => DV, Snapshots}
import graft.plans.MvShape

/** RETRACTION-CAPABLE incremental maintenance of a summary over a
  * graft-dv table, fed by the CHANGE DATA FEED — the IVM face that
  * stays correct under DELETE / UPDATE / MERGE, where [[MvMaintain]]
  * documents its own append-only boundary.
  *
  * Row kinds in the maintained store (all APPENDS — no partial-store
  * row is ever rewritten, so every write is the idempotent
  * dynamic-overwrite-own-slice replay shape [[MvMaintain]] pinned):
  *  - `kind='p'` PARTIAL: a batch's grain-level aggregate of its
  *    insert/update_postimage rows — the classic additive delta;
  *  - `kind='r'` RESET: an ABSOLUTE per-grain snapshot re-derived from
  *    the table at the batch's end version, emitted for every grain
  *    the batch RETRACTS from (delete / update_preimage rows). A
  *    reset supersedes everything older for its grain; [[merged]]
  *    folds (last reset) + (partials newer than it).
  *
  * WHY RESETS, NOT ARITHMETIC NEGATION (the textbook SUM/COUNT
  * retraction): this engine's tombstones are RETROACTIVE — a lazily
  * read feed step omits rows that a LATER delete masked, while the
  * delete's own sidecar still carries their materialized images. A
  * lagging consumer subtracting those pre-images would retract rows
  * it never added (net-negative sums). An absolute reset derived from
  * `readVersion(step end)` is immune in both directions and converges
  * exactly at quiesce:
  *  - rows inserted AFTER the step live in files the step's manifest
  *    lacks — never double-counted;
  *  - rows the CURRENT mask removed are absent from the reset, and
  *    each such delete dirties its own grain with a NEWER reset.
  * It also makes MIN/MAX maintainable (the VERDICT's mark-dirty +
  * re-derive), with ONE mechanism for every aggregate class.
  *
  * 100 TB shape: a batch costs O(batch) for its additive partials
  * plus O(dirty grains' base rows) for resets — the touched-grain
  * semi-join prunes the base scan to the retracted grains (partition
  * pruning when the grain leads the layout; never a full re-scan of
  * untouched grains). A delete-free stream degenerates to exactly
  * [[MvMaintain]]'s O(batch) appends.
  */
object MvDmlMaintain {

  /** grain-hash partition buckets (bounded compaction fan-in). */
  val NB = 16

  private def partialExprs(shapes: Seq[MvShape]): Seq[Column] =
    shapes.map(s => expr(s.sql).as(s.stored)) :+
      count(lit(1)).as("_rn")

  private def withLayout(df: DataFrame, grain: Seq[String],
      slice: String): DataFrame =
    df.withColumn("p", pmod(xxhash64(grain.map(col): _*), lit(NB)))
      .withColumn("slice", lit(slice))

  /** Apply one CDF micro-batch (rows carrying `_change_type` and
    * `_commit_version`). Idempotent: the batch's rows land under its
    * own `slice` (keyed by its max commit version), so a replay
    * dynamic-overwrites exactly itself.
    *
    * `prepare` turns raw FACT rows into the frame the shapes
    * aggregate over — identity for a single-table summary; for a
    * STAR summary it joins the batch (and the reset base) to the
    * dimension tables: fact-delta ⋈ dims is the textbook star IVM,
    * O(batch) broadcast-join cost for the additive side, and the
    * retraction resets re-derive THROUGH the same join — so a grain
    * keyed by a DIM attribute stays exactly maintainable under
    * DELETE/UPDATE/MERGE on the fact. Dims are static between
    * seeds (the [[MvMaintain]] boundary: dimension churn needs
    * retro-propagation, deliberately out of scope — re-seed).
    */
  def applyChanges(spark: SparkSession, root: String, changes: DataFrame,
      mvDir: String, grain: Seq[String], shapes: Seq[MvShape],
      prepare: DataFrame => DataFrame = identity): Unit = {
    val ch = changes.localCheckpoint()
    if (ch.isEmpty) return
    val bid = ch.agg(max(col("_commit_version"))).head().getLong(0)
    val changeCols = Seq("_change_type", "_commit_version",
      "_commit_timestamp").filter(ch.columns.contains)
    // prepare sees FACT rows only (grain may be dim-side, so grains
    // resolve on the PREPARED frame)
    def facts(types: String*) = prepare(
      ch.filter(col("_change_type").isin(types: _*))
        .drop(changeCols: _*))
    val adds = facts("insert", "update_postimage")
    val rets = facts("delete", "update_preimage")
    val dirty = rets.select(grain.map(col): _*).distinct()
      .localCheckpoint()
    // additive partials: adds of grains this batch also retracts from
    // are SKIPPED — their reset (derived from the batch-end version,
    // which already contains those rows) is absolute
    val partials = adds.join(dirty, grain, "left_anti")
      .groupBy(grain.map(col): _*)
      .agg(partialExprs(shapes).head, partialExprs(shapes).tail: _*)
      .withColumn("sid", lit(s"p$bid"))
      .withColumn("bid", lit(bid))
      .withColumn("kind", lit("p"))
    val resets =
      if (dirty.isEmpty) None
      else {
        val base = prepare(DV.readVersion(spark, root, bid))
        val derived = base.join(dirty, grain, "left_semi")
          .groupBy(grain.map(col): _*)
          .agg(partialExprs(shapes).head, partialExprs(shapes).tail: _*)
        // a grain whose last row was deleted VANISHES from the base:
        // its reset row carries _rn=0 (null partials) and merged()
        // drops the grain once no newer partial revives it
        Some(dirty.join(derived, grain, "left")
          .withColumn("_rn", coalesce(col("_rn"), lit(0L)))
          .withColumn("sid", lit(s"r$bid"))
          .withColumn("bid", lit(bid))
          .withColumn("kind", lit("r")))
      }
    val out = resets.map(partials.unionByName(_)).getOrElse(partials)
      .localCheckpoint()
    if (!out.isEmpty)
      Scd2Log.withDynamicOverwrite(spark) {
        withLayout(out, grain, s"b$bid")
          .write.mode("overwrite").partitionBy("p", "slice")
          .parquet(mvDir)
      }
  }

  /** Seed the store from the snapshot at version `v` (one absolute
    * pass, tagged as inserts at `v`) — the consumer-start handshake:
    * snapshot at v, then [[catchUp]]/[[maintain]] strictly after v.
    */
  def seed(spark: SparkSession, root: String, mvDir: String,
      grain: Seq[String], shapes: Seq[MvShape], v: Long,
      prepare: DataFrame => DataFrame = identity): Unit =
    applyChanges(spark, root,
      DV.readVersion(spark, root, v)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v)),
      mvDir, grain, shapes, prepare)

  /** Batch catch-up: fold every committed version in `(fromV, latest]`
    * through [[applyChanges]], one batch per commit — the face a
    * scheduled (non-streaming) refresh and the specs drive. Returns
    * the number of versions applied.
    */
  def catchUp(spark: SparkSession, root: String, mvDir: String,
      grain: Seq[String], shapes: Seq[MvShape], fromV: Long,
      prepare: DataFrame => DataFrame = identity): Long = {
    val committed = Snapshots
      .committedVersions(spark, DV.manifestTable(root))
      .filter(_ > fromV).sorted
    var prev = fromV
    committed.foreach { v =>
      applyChanges(spark, root, DV.readChanges(spark, root, prev, v),
        mvDir, grain, shapes, prepare)
      prev = v
    }
    compact(spark, mvDir, grain, shapes): Unit
    committed.size.toLong
  }

  /** Launch the maintenance stream over the table's own CDF source —
    * each micro-batch is one or more committed versions, applied with
    * the same idempotent slice discipline.
    */
  def maintain(spark: SparkSession, root: String, checkpoint: String,
      mvDir: String, grain: Seq[String], shapes: Seq[MvShape],
      startingVersion: Long,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      prepare: DataFrame => DataFrame = identity)
      : StreamingQuery =
    spark.readStream.format("graft-dv-cdf")
      .option("path", root)
      .option("startingVersion", startingVersion)
      .load()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // no stream-identity marker here (unlike MvMaintain): slices
        // are keyed by COMMIT VERSION, not the checkpoint's batch id,
        // so any writer — this stream, a restarted one, or a batch
        // catchUp — writing version v writes the same content to the
        // same slice; mixed batch/stream maintenance is safe by
        // construction
        applyChanges(batch.sparkSession, root, batch, mvDir, grain,
          shapes, prepare)
        // bound the store on stream cadence: a 1-version-per-batch
        // CDC year must not accrete 100k slices
        compact(batch.sparkSession, mvDir, grain, shapes): Unit
      }
      .start()

  /** COMPACTION — bounds the store at O(grain cardinality) instead of
    * O(batches ever): per bucket, fold the ACTIVE row set (each
    * grain's last reset + partials newer than it — exactly what
    * [[merged]] serves) into one slice and drop the input slices.
    * Crash-safe WITHOUT coordination, by the store's own read rules:
    * folded rows keep their original (grain, sid) keys, so a crash
    * between the fold write and the input deletes leaves EXACT
    * duplicates ([[merged]]'s dropDuplicates absorbs them), and any
    * INACTIVE rows surviving in un-deleted inputs are filtered by the
    * last-reset rule regardless of which slice they sit in — leftover
    * slices cost bytes, never correctness. Returns input slices
    * removed, 0 when under `minSlices`.
    */
  def compact(spark: SparkSession, mvDir: String, grain: Seq[String],
      shapes: Seq[MvShape], minSlices: Int = 8): Long = {
    val root = new org.apache.hadoop.fs.Path(mvDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0L
    val buckets = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("p="))
    val victims = buckets.flatMap { b =>
      fs.listStatus(b.getPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("slice="))
        .map(s => (b.getPath.getName, s.getPath))
    }
    val perBucket = victims.groupBy(_._1)
    val hot = perBucket.filter(_._2.size >= minSlices)
    if (hot.isEmpty) return 0L
    val maxBid = spark.read.parquet(mvDir)
      .agg(max(col("bid"))).head().getLong(0)
    val foldSlice = s"c$maxBid"
    val hotP = hot.keys.map(_.stripPrefix("p=").toLong).toSeq
    // the active set of the hot buckets, re-sliced under one fold id
    // (rows keep their own sid/bid/kind — the fold only RELOCATES)
    val rows = spark.read.parquet(mvDir)
      .filter(col("p").isin(hotP: _*))
      .dropDuplicates(grain :+ "sid")
    val lastReset = rows.filter(col("kind") === "r")
      .groupBy(grain.map(col): _*)
      .agg(max(col("bid")).as("__rb"))
    val active = rows.join(lastReset, grain, "left")
      .filter(col("__rb").isNull || col("bid") > col("__rb") ||
        (col("kind") === "r" && col("bid") === col("__rb")))
      .drop("__rb")
      .localCheckpoint() // freeze BEFORE the inputs are removed
    Scd2Log.withDynamicOverwrite(spark) {
      active.withColumn("slice", lit(foldSlice))
        .write.mode("overwrite").partitionBy("p", "slice").parquet(mvDir)
    }
    var removed = 0L
    hot.values.flatten.foreach { case (_, slicePath) =>
      if (slicePath.getName != s"slice=$foldSlice" &&
          fs.delete(slicePath, true)) removed += 1
    }
    removed
  }

  /** The maintained summary folded to one row per grain: per grain,
    * the LAST reset (absolute) plus every partial NEWER than it —
    * sum-class partials re-sum, min/max re-min/max. Grains whose
    * active rows carry zero base rows (deleted away) drop out, exactly
    * as the base aggregate would.
    */
  def merged(spark: SparkSession, mvDir: String, grain: Seq[String],
      shapes: Seq[MvShape]): DataFrame = {
    val rows = spark.read.parquet(mvDir)
      .dropDuplicates(grain :+ "sid")
    val lastReset = rows.filter(col("kind") === "r")
      .groupBy(grain.map(col): _*)
      .agg(max(col("bid")).as("__rb"))
    val active = rows.join(lastReset, grain, "left")
      .filter(col("__rb").isNull || col("bid") > col("__rb") ||
        (col("kind") === "r" && col("bid") === col("__rb")))
    val mergeCols = shapes.map { s =>
      val fn = s.key.takeWhile(_ != '|') match {
        case "sum" | "count" => "sum"
        case other => other // min|max partials re-min/max
      }
      expr(s"$fn(${s.stored})").as(s.stored)
    } :+ sum(col("_rn")).as("__n")
    active.groupBy(grain.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
      .filter(col("__n") > 0)
      .drop("__n")
  }
}
