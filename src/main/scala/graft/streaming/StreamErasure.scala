package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten for the STREAMING state layouts (round 8):
  * [[Scd2Log]]'s (bucket, slice) change-log plus its bucket-partitioned
  * derived state table, and [[AnnIndex]]'s (c_id, slice) inverted
  * lists. The batch operator ([[graft.operators.Erasure]]) rewrites
  * partitions of a plain sink; these layouts add two twists:
  *
  *  - the unit of rewrite is the (partCol, slice) LEAF — the same unit
  *    replay and compaction use — so a purge rewrites exactly the
  *    victim-bearing slices and every other slice's files stay
  *    byte-identical (spec-pinned);
  *  - derived state must be repaired explicitly: the SCD2 state table
  *    is rebuilt for exactly the victim buckets from the purged log
  *    (the `maintainScd2` path-scoped rebuild), because a purged user
  *    never arrives again to trigger it — and a bucket left with no
  *    survivors is REMOVED, not skipped (the dynamic-overwrite edge
  *    case `Erasure` closes for plain sinks, here for both the log
  *    and the state table).
  *
  * Crash-safety: each purged slice is rewritten WRITE-NEW-THEN-DELETE
  * (kept rows staged via localCheckpoint into a fresh `slice=e<old>`
  * leaf, then the old leaf dropped) — a crash at any point leaves
  * either the old slice intact or kept-rows duplicated across two
  * slices, and the log's set semantics (dedup on the record key —
  * [[Scd2Log]]'s stated invariant) erase duplicates while a rerun of
  * the idempotent purge converges on the victim-free set. The same
  * reasoning makes the purge safe to rerun after racing a concurrent
  * compaction of the same bucket; the operational contract is
  * compaction's — run between micro-batches (foreachBatch is
  * single-threaded per query), rerun on any doubt.
  *
  * StreamErasureSpec holds both purged streams to the
  * batch-rebuild-over-the-purged-corpus oracle, including across a
  * checkpoint RESTART (the stream keeps maintaining the purged layout
  * and never resurrects the victim).
  */
object StreamErasure {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Purge victim keys from the (partCol, slice) leaves under the
    * given partition values. Discovery reads ONLY those partitions'
    * directories (path-scoped, the [[Scd2Log.touchedLog]] property);
    * the affected-leaf list is driver-bounded (slices per partition
    * are compaction-bounded, partitions by the victim list). Returns
    * the (partValue, slice) leaves rewritten or removed.
    */
  def purgeSlices(spark: SparkSession, logDir: String, partCol: String,
      partValues: Seq[Long], keyCol: String,
      victims: DataFrame): Seq[(Long, String)] = {
    val f = fs(spark, logDir)
    val present = partValues.distinct.sorted
      .filter(b => f.exists(new Path(s"$logDir/$partCol=$b")))
    if (present.isEmpty) return Seq.empty
    val paths = present.map(b => s"$logDir/$partCol=$b")
    val affected = spark.read.option("basePath", logDir).parquet(paths: _*)
      .join(broadcast(victims), Seq(keyCol), "left_semi")
      .select(col(partCol).cast("long").as("p"), col("slice").cast("string").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(identity).toSeq
    affected.foreach { case (b, s) =>
      val oldLeaf = new Path(s"$logDir/$partCol=$b/slice=$s")
      val kept = spark.read.parquet(oldLeaf.toString)
        .join(broadcast(victims), Seq(keyCol), "left_anti")
        .localCheckpoint(true) // staged: the write never reads oldLeaf
      if (!kept.isEmpty)
        kept.write.mode("overwrite")
          .parquet(s"$logDir/$partCol=$b/slice=e$s")
      f.delete(oldLeaf, true): Unit
    }
    // partitions whose every slice was removed: drop the directory so
    // path-scoped readers never open an empty parquet dir
    affected.map(_._1).distinct.foreach { b =>
      val bdir = new Path(s"$logDir/$partCol=$b")
      if (f.exists(bdir) &&
          !f.listStatus(bdir).exists(_.getPath.getName.startsWith("slice=")))
        f.delete(bdir, true): Unit
    }
    affected
  }

  /** SCD2 user erasure: purge the change-log (victim buckets are
    * COMPUTABLE — [[graft.operators.Scd2.bucketOf]] — so discovery
    * never lists or reads any other bucket) and repair the derived
    * state table for exactly those buckets from the purged log.
    * Returns the victim buckets.
    */
  def eraseUserScd2(spark: SparkSession, accDir: String, stateDir: String,
      victims: DataFrame): Seq[Long] = {
    import graft.operators.Scd2
    val v = victims.select(col("user_id")).distinct().localCheckpoint(true)
    val buckets = v.select(Scd2.bucketOf(col("user_id")).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    if (buckets.isEmpty) return Seq.empty
    purgeSlices(spark, accDir, "bucket", buckets, "user_id", v): Unit
    // rebuild state for the surviving part of the purged buckets
    val f = fs(spark, accDir)
    val live = buckets.filter(b => f.exists(new Path(s"$accDir/bucket=$b")))
    val stagedOpt = if (live.isEmpty) None else Some(
      Scd2.history(Scd2Log.touchedLog(spark, accDir, live).drop("bucket"))
        .withColumn("bucket", Scd2.bucketOf(col("user_id")))
        .localCheckpoint(true))
    stagedOpt.foreach { staged =>
      Scd2Log.withDynamicOverwrite(spark) {
        staged.write.mode("overwrite").partitionBy("bucket").parquet(stateDir)
      }
    }
    // state buckets with NO survivors: dynamic overwrite saw no rows
    // for them — remove explicitly, or the victim's state outlives
    // the erasure of its own history
    val surviving: Set[Long] = stagedOpt
      .map(_.select(col("bucket").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)
    val sfs = fs(spark, stateDir)
    buckets.filterNot(surviving).foreach { b =>
      val d = new Path(s"$stateDir/bucket=$b")
      if (sfs.exists(d)) sfs.delete(d, true): Unit
    }
    buckets
  }

  /** ANN inverted-list erasure: a vector's cell is data-dependent
    * (coarse assignment needs the embedding, which an erasure request
    * doesn't carry), so discovery is one column-pruned scan of the
    * slim (vec_id, c_id) code rows — at warehouse scale a serving
    * deployment keeps the vec_id→c_id assignment map this scan
    * reconstructs, making discovery a lookup. Purge unit is the
    * (c_id, slice) leaf, same machinery as SCD2's.
    */
  def eraseVectorAnn(spark: SparkSession, indexDir: String,
      victims: DataFrame): Seq[(Long, String)] = {
    val v = victims.select(col("vec_id")).distinct().localCheckpoint(true)
    val cells = spark.read.parquet(indexDir)
      .join(broadcast(v), Seq("vec_id"), "left_semi")
      .select(col("c_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    purgeSlices(spark, indexDir, "c_id", cells, "vec_id", v)
  }

  /** Chunk erasure for the MAINTAINED RAG serving index
    * ([[RagIndex]]) — the sliced-layout counterpart of
    * [[graft.queries.RetrievalQueries.ragForget]] (which handles the
    * batch-built index's plain partitions). All three layouts:
    * victim-bearing (c_id, slice) inverted-list leaves and
    * (pb, slice) postings leaves through [[purgeSlices]]'s
    * write-new-then-delete discipline, then the `_stats` partials
    * replaced with one partial recomputed from the purged lists
    * (derived-sum state cannot be repaired by leaf rewrites — a SUM
    * doesn't dedupe — so it is re-derived, the
    * [[eraseUserScd2]] state-table move). Discovery per layout is one
    * column-pruned semi-join; idempotent by the same set-semantics
    * argument as the other purges.
    */
  def eraseChunksRag(spark: SparkSession, indexDir: String,
      victims: DataFrame): Seq[(Long, String)] = {
    val v = victims.select(col("cid")).distinct().localCheckpoint(true)
    val cells = spark.read.parquet(indexDir)
      .join(broadcast(v), Seq("cid"), "left_semi")
      .select(col("c_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val listLeaves = purgeSlices(spark, indexDir, "c_id", cells, "cid", v)
    val buckets = spark.read.parquet(s"$indexDir/_postings")
      .join(broadcast(v), Seq("cid"), "left_semi")
      .select(col("pb").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    purgeSlices(spark, s"$indexDir/_postings", "pb", buckets, "cid", v)
    graft.queries.RetrievalQueries.ragRefreshStats(spark, indexDir)
    listLeaves
  }

  /** Streaming right-to-be-forgotten over a
    * [[graft.operators.DeletionVectors]] table (round 9): a stream of
    * deletion REQUESTS applied per micro-batch. This is the LIVE
    * deletion path the DV design exists for — requests arrive
    * continuously, each batch costs O(its victims' rows) sidecar
    * bytes and touches no data file, and the masked table is current
    * at every batch boundary.
    *
    * Exactly-once comes FREE here, with no batch-id bookkeeping:
    * foreachBatch is at-least-once, but `DV.delete` marks through the
    * DV mask, so a replayed batch (crash between sidecar append and
    * checkpoint commit, or a restart re-delivering the last batch)
    * finds its victims already invisible and appends zero tombstones
    * — the structural-idempotency twin of `publishVersionedMetrics`'
    * deterministic-version claims. StreamErasureSpec pins: tombstone
    * count stays EXACTLY the victim row count under overlapping
    * redelivery and a checkpoint restart, and the masked read equals
    * the batch filter throughout.
    */
  def startDvErasure(requests: DataFrame, root: String, keyCol: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger)
      : org.apache.spark.sql.streaming.StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.DeletionVectors.delete(
          batch.sparkSession, root, keyCol, batch): Unit
      }
      .start()
}
