package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level deletes WITHOUT partition rewrite: positional deletion
  * vectors over an immutable parquet sink, the Iceberg v2 /
  * Delta-deletion-vector design that [[Erasure]]'s partition-rewrite
  * form deliberately does not cover.
  *
  * Why a second deletion operator: [[Erasure.erase]] costs O(affected
  * PARTITIONS) — right when victims cluster into few partitions, but a
  * 100 TB sink whose victims scatter (one user's rows across every
  * day) degrades to a near-full rewrite. A deletion vector instead
  * records (file, row-position) tombstones in a sidecar and applies
  * them at read; the delete writes O(deleted ROWS) bytes, touching no
  * data file. The trade is read-side: every scan carries a broadcast
  * anti-join against the sidecar, so [[purge]] bounds the sidecar by
  * rewriting any file whose deleted fraction crosses a threshold —
  * write amplification is deferred, batched, and capped.
  *
  * Layout (all under one table root):
  * {{{
  *   t/data/day=D/part-N.parquet   immutable data files (never edited)
  *   t/_dv/part-N.parquet          append-only (file, pos) tombstones
  *   t/_manifest/v=N + markers     LIVE FILE SET per version, committed
  *                                 via the [[Snapshots]] claim protocol
  * }}}
  *
  * The versioned MANIFEST is what makes file-level operations atomic
  * on a plain filesystem/object store: readers resolve the committed
  * live-file set and read exactly those files, so [[purge]] can move
  * replacement files into the data directories INVISIBLY and flip them
  * live with one marker create — no reader ever sees a row doubled
  * (old file + its rewrite) or dropped mid-swap. Rows are positioned
  * by the file source's own metadata columns (`_metadata.file_path`,
  * `_metadata.row_index`) — stable physical positions derived from
  * parquet row-group offsets, no synthetic key column needed.
  *
  * Time-travel semantics — CHOSEN, and different from Iceberg's:
  * manifests version the FILE SET, but the tombstone sidecar is
  * global — a historical read (old manifest + current sidecar)
  * applies deletions RETROACTIVELY. Two consequences, one desired,
  * one accepted:
  *  - right-to-be-forgotten composes with time travel: no historical
  *    version ever resurrects a deleted row (for the GDPR use case
  *    this is the point — Iceberg-style versioned delete files would
  *    keep victims readable at old snapshots until history expiry);
  *  - an [[upsert]]'s OLD images are tombstoned globally too, so a
  *    pre-upsert manifest read shows the updated keys ABSENT rather
  *    than at their old values. Row-image history is not this
  *    layer's job — the SCD2 family (`scd2_history`/`Scd2Log`) is
  *    the engine's versioned-row store; pair them when both
  *    retroactive erasure and image history are needed.
  * DeletionVectorsSpec pins both directions.
  *
  * Scale shape at 100 TB:
  *  - [[delete]] is one metadata-column scan semi-joined against the
  *    broadcast victim list, writing O(victim rows) sidecar bytes;
  *    with a victim PREDICATE pushed into the scan it reads only
  *    matching row groups. No data file is opened for write.
  *  - [[read]] lists files from the manifest (driver-side, bounded by
  *    file count — the same bounded-metadata exception as Erasure's
  *    partition list) and anti-joins the sidecar broadcast-side; the
  *    sidecar stays broadcast-sized BECAUSE purge caps the deleted
  *    fraction per file — the threshold is the knob trading read-side
  *    join size against write amplification.
  *  - [[purge]] rewrites only files past the threshold; tombstones of
  *    replaced files become inert (their file path is no longer in
  *    the manifest... and never matches a live row again), so DV
  *    correctness needs NO coordinated sidecar rewrite; [[vacuum]]
  *    reclaims them by deleting whole sidecar batch-files whose
  *    entries ALL reference dead files — file-level GC, no edit, no
  *    atomicity hazard.
  *  - idempotency is structural: [[delete]] marks through the DV mask
  *    (it reads only live, not-yet-deleted rows), so replaying a
  *    delete appends zero tombstones.
  */
object DeletionVectors {

  def dataDir(root: String): String = s"$root/data"
  def dvDir(root: String): String = s"$root/_dv"
  def manifestTable(root: String): String = s"$root/_manifest"

  private def hfs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Create the table: write `df` hive-partitioned by `partCol` and
    * commit manifest v1 = every written file. The per-file row counts
    * ride along for purge's threshold math (one extra metadata-column
    * aggregate at write time — amortized into the initial load).
    */
  def init(spark: SparkSession, df: DataFrame, root: String,
      partCol: String): Long = {
    val f = hfs(spark, root)
    f.delete(new Path(root), true)
    df.write.mode("overwrite").partitionBy(partCol).parquet(dataDir(root))
    val manifest = spark.read.parquet(dataDir(root))
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("rows"))
    Snapshots.publish(spark, manifestTable(root), manifest)
  }

  /** The committed live-file set: (file, rows). */
  def manifest(spark: SparkSession, root: String): DataFrame =
    Snapshots.readLatest(spark, manifestTable(root))

  /** Driver-side live file list — bounded by file count (metadata). */
  private def liveFiles(spark: SparkSession, root: String): Seq[String] =
    manifest(spark, root).select("file").collect().map(_.getString(0)).toSeq

  /** All tombstones, (file, pos). Before any delete this is an empty
    * LOCAL relation — `PropagateEmptyRelation` then erases the read
    * path's anti-join outright, so a never-deleted-from table scans
    * with zero join overhead.
    *
    * Duplicate tombstones (two concurrent deletes marking the same
    * row — both read the pre-append mask) are HARMLESS: the anti-join
    * is set-semantics on (file, pos), duplicates only cost sidecar
    * bytes until vacuum. Deletes need no writer coordination.
    */
  def dv(spark: SparkSession, root: String): DataFrame = {
    val f = hfs(spark, root)
    val d = new Path(dvDir(root))
    if (f.exists(d) && f.listStatus(d).exists(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet")))
      spark.read.parquet(dvDir(root))
    else {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("file", "pos")
    }
  }

  /** Live rows of `files` (manifest scope) with their physical
    * position columns, tombstones already applied. Metadata columns
    * must be selected BEFORE the join (they belong to the scan).
    */
  private def withPos(spark: SparkSession, root: String,
      files: Seq[String]): DataFrame = {
    val data = spark.read.option("basePath", dataDir(root))
      .parquet(files: _*)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
    val tomb = dv(spark, root)
      .withColumnRenamed("file", "__file").withColumnRenamed("pos", "__pos")
    data.join(broadcast(tomb), Seq("__file", "__pos"), "left_anti")
  }

  /** Masked read restricted to a subset of the LIVE files — the hook
    * that lets file-skipping indexes ([[SkippingIndex]]) compose with
    * a DV table: the index prunes to candidate files, this applies
    * the tombstone mask to exactly those. Callers must pass live
    * (manifest) files; dead files would resurrect purged rows.
    */
  def readFiles(spark: SparkSession, root: String,
      files: Seq[String]): DataFrame =
    withPos(spark, root, files).drop("__file", "__pos")

  /** The table as readers see it: committed files minus tombstones.
    * A table whose purge removed EVERY file from the manifest (all
    * rows deleted) is still readable — schema comes from the data
    * directory, which keeps the dead files until [[vacuum]].
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val files = liveFiles(spark, root)
    if (files.isEmpty) spark.read.parquet(dataDir(root)).limit(0)
    else withPos(spark, root, files).drop("__file", "__pos")
  }

  /** Tombstone every live row whose `keyCol` appears in `victims`.
    * Returns the number of rows marked. O(deleted rows) bytes written;
    * zero data files touched. Replay-safe: already-deleted rows are
    * invisible to the marking scan, so a rerun appends nothing.
    */
  def delete(spark: SparkSession, root: String, keyCol: String,
      victims: DataFrame): Long = {
    val files = liveFiles(spark, root)
    if (files.isEmpty) return 0L // fully-purged table: nothing to mark
    val marked = withPos(spark, root, files)
      .join(broadcast(victims.select(col(keyCol)).distinct()),
        Seq(keyCol), "left_semi")
      .select(col("__file").as("file"), col("__pos").as("pos"))
      .localCheckpoint() // one marking scan feeds both count and write
    val n = marked.count()
    // one sidecar file per ~10M tombstones: a delete is human-scale
    // relative to the table, and vacuum GC works per batch-file — a
    // 32-way sliver spray would turn the sidecar into a small-file
    // problem of its own
    if (n > 0) marked
      .coalesce(math.max(1L, n / 10000000L).toInt)
      .write.mode("append").parquet(dvDir(root))
    n
  }

  /** Rewrite every live file whose deleted fraction exceeds
    * `maxDeletedFraction`, commit the next manifest version, and
    * return the replaced files. Two-phase and crash-safe:
    *
    *  1. kept rows of hot files are written to a staging dir under the
    *     table root (readers never list it), then MOVED into the data
    *     partition dirs — present on disk but NOT in any committed
    *     manifest, so invisible;
    *  2. one [[Snapshots.publish]] flips the live set to
    *     (live − hot) ∪ replacements. A crash before the commit leaves
    *     orphan replacement files (dead weight for [[vacuum]]), never
    *     a double or missing row; old manifest versions still resolve,
    *     so time travel across the purge keeps working.
    */
  def purge(spark: SparkSession, root: String, partCol: String,
      maxDeletedFraction: Double): Seq[String] = {
    val counts = dv(spark, root).groupBy("file").count()
    val hot = manifest(spark, root)
      .join(counts, Seq("file"), "left")
      .filter(coalesce(col("count"), lit(0L)) >
        col("rows") * maxDeletedFraction)
      .select("file").collect().map(_.getString(0)).toSeq
    if (hot.isEmpty) return Seq.empty

    val f = hfs(spark, root)
    val stage = s"$root/_purge_stage"
    f.delete(new Path(stage), true)
    // kept rows of hot files only; stage BEFORE any move so the swap
    // never consumes what it replaces (the Erasure/Scd2Log discipline)
    withPos(spark, root, hot).drop("__file", "__pos")
      .write.mode("overwrite").partitionBy(partCol).parquet(stage)

    // move staged files into their data partition dirs under fresh
    // names; recount them for the manifest as they land
    val moved = Seq.newBuilder[String]
    val tag = java.util.UUID.randomUUID().toString.take(8)
    f.listStatus(new Path(stage))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .foreach { dir =>
        val destDir = new Path(s"${dataDir(root)}/${dir.getPath.getName}")
        f.mkdirs(destDir)
        f.listStatus(dir.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (s, i) =>
            val dest = new Path(destDir, s"purged-$tag-$i.parquet")
            require(f.rename(s.getPath, dest), s"rename to $dest failed")
            moved += dest.toString
          }
      }
    f.delete(new Path(stage), true)

    val movedStats =
      if (moved.result().isEmpty) spark.range(0).select(
        lit("").as("file"), lit(0L).as("rows")).limit(0)
      else spark.read.option("basePath", dataDir(root))
        .parquet(moved.result(): _*)
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(count(lit(1)).as("rows"))
    val next = manifest(spark, root)
      .filter(!col("file").isin(hot: _*))
      .unionByName(movedStats)
    Snapshots.publish(spark, manifestTable(root), next): Unit
    hot
  }

  /** MERGE-ON-READ upsert (the Iceberg-v2 row-level write path that
    * [[delete]] is half of): apply a change batch — updated rows and
    * fresh inserts — WITHOUT rewriting any existing file. Old
    * versions of updated keys are tombstoned (O(changed rows)
    * sidecar bytes), the new row images land as freshly APPENDED
    * files, and one manifest publish makes both visible atomically:
    * a reader resolves either the old manifest (old rows live, no
    * new files) or the new one (old rows masked, new files live) —
    * never a key doubled or missing mid-upsert.
    *
    * Contrast with `merge_upsert` (copy-on-write: the touched
    * partitions rewrite, reads stay join-free): MOR shifts that cost
    * to the read-side anti-join, which [[purge]] bounds — the same
    * trade the delete path makes, here extended to updates. At
    * 100 TB a CDC trickle (0.1%/batch) copy-on-write amplifies every
    * batch to the touched-partition bytes; MOR writes just the
    * changed rows and compacts on ITS schedule.
    *
    * Replays: NOT structurally idempotent (a replayed append would
    * double the new images) — a replaying producer must gate on a
    * deterministic manifest version, exactly what
    * [[Snapshots.publishAt]] provides; the batch form here uses the
    * racing [[Snapshots.publish]].
    *
    * @param changes new row images, same schema as the table's data
    *                (including the partition column)
    * @return (tombstoned old rows, appended files)
    */
  def upsert(spark: SparkSession, root: String, partCol: String,
      keyCol: String, changes: DataFrame): (Long, Seq[String]) =
    upsertVersioned(spark, root, partCol, keyCol, changes, None)

  /** [[upsert]] with an optional DETERMINISTIC manifest version — the
    * replay-safe form for streaming CDC apply (version = batchId+1,
    * committed via [[Snapshots.publishAt]]).
    *
    * Replay semantics: a replayed batch whose version already
    * committed returns as a no-op BEFORE tombstoning or moving
    * anything. A batch that crashed mid-apply leaves (a) tombstones —
    * already correct, the rerun's delete re-marks nothing through the
    * mask — and (b) moved-but-uncommitted files, which stay invisible
    * (not in any manifest) and become vacuum fodder when the rerun
    * appends its own copies and commits.
    *
    * Transient a reader CAN observe between a crashed attempt and its
    * rerun: updated keys masked with their new images not yet
    * committed (tombstones apply immediately, the manifest flip only
    * exposes the appends). That is the read-committed gap of any
    * delete-then-insert done as two steps; the rerun closes it, and
    * within one healthy apply the window is the move→commit
    * milliseconds. A reader needing snapshot isolation across it
    * pins a manifest version (time travel) for the whole read.
    */
  def upsertVersioned(spark: SparkSession, root: String, partCol: String,
      keyCol: String, changes: DataFrame,
      version: Option[Long]): (Long, Seq[String]) = {
    version.foreach { v =>
      if (Snapshots.committedVersions(spark, manifestTable(root))
          .contains(v))
        return (0L, Seq.empty) // replay of a committed batch: no-op
    }
    val staged = changes.localCheckpoint() // one derivation, three uses
    val masked = delete(spark, root, keyCol, staged.select(col(keyCol)))

    // append the new images as fresh files under the data dirs (the
    // purge move discipline: land invisibly, then flip the manifest)
    val f = hfs(spark, root)
    val stage = s"$root/_upsert_stage"
    f.delete(new Path(stage), true)
    staged.write.mode("overwrite").partitionBy(partCol).parquet(stage)
    val moved = Seq.newBuilder[String]
    val tag = java.util.UUID.randomUUID().toString.take(8)
    f.listStatus(new Path(stage))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .foreach { dir =>
        val destDir = new Path(s"${dataDir(root)}/${dir.getPath.getName}")
        f.mkdirs(destDir)
        f.listStatus(dir.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (s, i) =>
            val dest = new Path(destDir, s"upsert-$tag-$i.parquet")
            require(f.rename(s.getPath, dest), s"rename to $dest failed")
            moved += dest.toString
          }
      }
    f.delete(new Path(stage), true)

    val newFiles = moved.result()
    val movedStats =
      if (newFiles.isEmpty) {
        import spark.implicits._
        Seq.empty[(String, Long)].toDF("file", "rows")
      } else spark.read.option("basePath", dataDir(root))
        .parquet(newFiles: _*)
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(count(lit(1)).as("rows"))
    val next = manifest(spark, root).unionByName(movedStats)
    version match {
      case Some(v) =>
        Snapshots.publishAt(spark, manifestTable(root), v, next): Unit
      case None =>
        Snapshots.publish(spark, manifestTable(root), next): Unit
    }
    (masked, newFiles)
  }

  /** Reclaim space: delete data files referenced by NO retained
    * manifest version (keep the newest `keepVersions`), then delete
    * any sidecar batch-file whose entries all reference dead files.
    * Both steps are whole-file deletes of unreachable state — safe to
    * crash or rerun at any point.
    */
  def vacuum(spark: SparkSession, root: String,
      keepVersions: Int = 1): (Long, Long) = {
    val mt = manifestTable(root)
    val keep = Snapshots.committedVersions(spark, mt).takeRight(keepVersions)
    val referenced = keep.map(v =>
        Snapshots.readVersion(spark, mt, v).select("file"))
      .reduce(_ unionByName _).distinct()
      .collect().map(_.getString(0)).toSet
    val f = hfs(spark, root)
    val dataRoot = new Path(dataDir(root))
    var dataDeleted = 0L
    f.listStatus(dataRoot).filter(_.isDirectory).foreach { dir =>
      f.listStatus(dir.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .foreach { s =>
          if (!referenced.contains(s.getPath.toString)) {
            f.delete(s.getPath, false): Unit
            dataDeleted += 1
          }
        }
    }
    Snapshots.vacuum(spark, mt, keepVersions)
    val dvd = new Path(dvDir(root))
    var dvDeleted = 0L
    if (f.exists(dvd) && f.listStatus(dvd).exists(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))) {
      // ONE job over the whole sidecar: per batch-file, does ANY entry
      // still reference a live file? (the per-file loop this replaces
      // ran a Spark job per batch — job-count, not data, was the cost)
      val dead = spark.read.parquet(dvDir(root))
        .select(col("_metadata.file_path").as("batch"), col("file"))
        .groupBy("batch")
        .agg(max(col("file").isin(referenced.toSeq: _*).cast("int"))
          .as("any_live"))
        .filter(col("any_live") === 0)
        .select("batch").collect().map(_.getString(0))
      dead.foreach { b =>
        f.delete(new Path(new java.net.URI(b)), false): Unit
        dvDeleted += 1
      }
    }
    (dataDeleted, dvDeleted)
  }
}
