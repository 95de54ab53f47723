package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-snapshot publish: atomic table swaps + time travel on a
  * plain filesystem/object store — the commit protocol a 100 TB
  * warehouse needs so readers NEVER observe a partially-written table
  * and writers can republish without coordinating with readers.
  *
  * Layout (Delta-log-shaped, minus the transaction payload):
  * {{{
  *   table/v=3/part-*.parquet     data for version 3
  *   table/_claims/3              one empty marker per CLAIMED version
  *   table/_commits/1 _commits/3  one empty marker per COMMITTED version
  * }}}
  *
  * The committed state is defined ONLY by `_commits/`: a version is
  * visible iff its marker exists, and the current table is the max
  * committed version. The single atomic primitive is EXCLUSIVE CREATE
  * of a marker (`FileSystem.create(path, overwrite=false)`) — atomic
  * on HDFS and local filesystems, and on object stores with
  * conditional-put (S3 If-None-Match); nothing here relies on atomic
  * rename or directory listing consistency.
  *
  * Why TWO marker kinds: with only commit markers, two publishers
  * racing to version N would both write into the SAME `v=N` directory
  * before either commits — their bytes interleave, so whichever
  * marker wins can make a CORRUPT mix visible, and the loser's bytes
  * are unusable for relocation (this is why a lost race can never be
  * repaired by renaming: the loser's "own" directory was never
  * exclusively its own). [[publish]] therefore claims the version
  * number FIRST (exclusive create in `_claims/`) and only the claim
  * winner writes `v=N`. Consequences:
  *
  *  - each data directory has exactly ONE writer, so the data write
  *    runs exactly once per claimed attempt — and in the common case
  *    exactly once per publish, because a lost claim is discovered
  *    BEFORE any data is written, not after;
  *  - a writer that dies after claiming but before the marker leaves
  *    invisible garbage (and a pinned claim), never a corrupt table —
  *    readers still resolve max committed < N;
  *  - a live claim shields its in-flight directory from [[vacuum]]:
  *    without it, a concurrent `rival-commits-N+1 then vacuum` could
  *    delete an uncommitted `v=N` moments before its publisher
  *    commits it, yielding a committed version with missing data;
  *  - time travel is just reading `v=K` for any committed K;
  *  - `vacuum(keep)` may delete data of old committed versions and
  *    any unclaimed uncommitted dir with version ≤ max committed (a
  *    dir ABOVE max committed, or one with a live claim, may belong
  *    to an in-flight publish and is left alone).
  *
  * Claims are released only by their owner (after commit, or on a
  * lost commit race). A publisher that crashes mid-flight leaves its
  * claim behind, pinning at most that attempt's garbage — bounded by
  * crash count, and deliberately NOT auto-expired: without leases or
  * timestamps a third party cannot distinguish a stale claim from a
  * slow in-flight writer, and deleting a live one reopens the vacuum
  * window above.
  *
  * Scale note: the protocol's cost is O(1) small-file operations per
  * publish plus one `_commits` listing per read — independent of data
  * volume; the data write itself is whatever the DataFrame costs.
  */
object Snapshots {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markers(spark: SparkSession, table: String,
      kind: String): Seq[Long] =
    LogStore.forPath(table)
      .listMarkers(fs(spark, table), new Path(s"$table/$kind"))
      .map(_._1)
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
      .sorted

  // ---- commit-log checkpoint (the Delta `_last_checkpoint` shape) ----
  //
  // A 1-version-per-batch CDC stream mints ~100k versions/year, and
  // every read resolves `latestVersion` from a `_commits` listing —
  // O(retained versions) names per resolution. The checkpoint FOLDS
  // the committed-version index (version, commit instant) into ONE
  // immutable file `_commits/_index.<foldedMax>.<gen>`; readers take
  // the newest index (one file read) plus the listed UNFOLDED markers,
  // so a resolution costs O(versions since last fold), not
  // O(versions ever). Two-phase cleanup makes it race-free on stores
  // with non-atomic listings: fold N writes its index but deletes
  // NOTHING; fold N+1 deletes the markers fold N already covers (and
  // indexes older than N) — so any reader, however stale its listing,
  // finds every committed version in a surviving marker or a
  // surviving index. New commits are untouched: the exclusive-create
  // marker remains the one atomic visibility step, and folding stays
  // `lag` versions behind the tip so racing CAS writers always
  // resolve against real markers.

  private val IndexRe = """_index\.(\d+)\.(\d+)""".r

  /** (version, commit-instant) pairs — ONE `_commits` listing plus at
    * most one index-file read; the merged committed view every
    * resolution below rides.
    */
  private def commitEntries(spark: SparkSession,
      table: String): Seq[(Long, Long)] =
    commitEntriesAttempt(spark, table, attempts = 5)

  private def commitEntriesAttempt(spark: SparkSession,
      table: String, attempts: Int): Seq[(Long, Long)] = {
    val f = fs(spark, table)
    val listed = LogStore.forPath(table)
      .listMarkers(f, new Path(s"$table/_commits"))
    val markerEntries = listed
      .filter(e => e._1.nonEmpty && e._1.forall(_.isDigit))
      .map(e => e._1.toLong -> e._2)
    val newest = listed.flatMap(e => e._1 match {
      case IndexRe(m, g) => Some((m.toLong, g.toLong, e._1))
      case _ => None
    }).sortBy(x => (x._1, x._2)).lastOption
    val idxEntries = newest.toSeq.flatMap(ix =>
      readIndexFile(spark, table, ix._3))
    // SUPERSESSION retry (the DvBlobs.merged rule): a listed index
    // found missing at read time means ≥2 folds landed since our
    // listing (only the fold after next deletes an index) — re-list
    // and converge on the newer one rather than serving markers alone
    if (newest.isDefined && idxEntries.isEmpty && attempts > 1)
      commitEntriesAttempt(spark, table, attempts - 1)
    else
      // markers win on dup (same instant anyway; an index never
      // outlives its markers' truth — it snapshots their mtimes)
      (idxEntries.toMap ++ markerEntries.toMap).toSeq.sortBy(_._1)
  }

  private def readIndexFile(spark: SparkSession, table: String,
      name: String): Seq[(Long, Long)] = {
    val p = new Path(s"$table/_commits/$name")
    val f = fs(spark, table)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream(4096)
        val bytes = new Array[Byte](4096)
        var n = in.read(bytes)
        while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
        new String(buf.toByteArray, "UTF-8").split("\n")
          .filter(_.nonEmpty).toSeq.map { line =>
            val Array(v, t) = line.split(",", 2)
            v.toLong -> t.toLong
          }
      } finally in.close()
    }
  }

  def committedVersions(spark: SparkSession, table: String): Seq[Long] =
    commitEntries(spark, table).map(_._1)

  def claimedVersions(spark: SparkSession, table: String): Seq[Long] =
    markers(spark, table, "_claims")

  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    committedVersions(spark, table).lastOption

  /** Commit instant (epoch millis) per committed version — the commit
    * marker's filesystem mtime, the same clock [[versionAsOf]] resolves
    * `TIMESTAMP AS OF` against (the marker create IS the atomic
    * visibility step). One `_commits` listing (+ one index read);
    * metadata scale.
    */
  def commitInstants(spark: SparkSession,
      table: String): Map[Long, Long] =
    commitEntries(spark, table).toMap

  /** Highest version committed AT OR BEFORE `tsMillis` — the
    * `TIMESTAMP AS OF` resolution rule. The commit INSTANT is the
    * commit marker's filesystem mtime: the marker create IS the
    * atomic visibility step, so its timestamp is definitionally when
    * the version became readable (no clock data rides in the marker
    * itself). None if nothing was committed yet at that instant.
    */
  def versionAsOf(spark: SparkSession, table: String,
      tsMillis: Long): Option[Long] =
    commitEntries(spark, table)
      .filter(_._2 <= tsMillis).map(_._1).sorted.lastOption

  /** FOLD the commit log: write a fresh `_index.<foldedMax>.<gen>`
    * covering every committed version up to `lag` behind the tip,
    * then (two-phase) delete the markers and indexes the PREVIOUS
    * fold already covers. No-op (false) when fewer than `minUnfolded`
    * markers would fold — the threshold that makes an every-commit
    * call cheap. Never touches the newest `lag` versions, so racing
    * claim/CAS writers keep resolving against real markers. Loses
    * gracefully: the index create is an atomic rename to a unique
    * name, so two concurrent folders produce one winner and one
    * harmless no-op.
    */
  def checkpointLog(spark: SparkSession, table: String, lag: Int = 8,
      minUnfolded: Int = 48): Boolean = {
    val f = fs(spark, table)
    val dir = new Path(s"$table/_commits")
    if (!f.exists(dir)) return false
    val listed = LogStore.forPath(table).listMarkers(f, dir)
    val markerEntries = listed
      .filter(e => e._1.nonEmpty && e._1.forall(_.isDigit))
      .map(e => e._1.toLong -> e._2)
    val indexes = listed.flatMap(e => e._1 match {
      case IndexRe(m, g) => Some((m.toLong, g.toLong, e._1))
      case _ => None
    }).sortBy(x => (x._1, x._2))
    val prev = indexes.lastOption
    val prevEntries = prev.toSeq.flatMap(ix =>
      readIndexFile(spark, table, ix._3))
    val merged = (prevEntries.toMap ++ markerEntries.toMap)
      .toSeq.sortBy(_._1)
    if (merged.isEmpty) return false
    val foldMax = merged.last._1 - lag
    val unfolded = markerEntries.count(e =>
      e._1 <= foldMax && !prev.exists(_._1 >= e._1))
    if (unfolded < minUnfolded) return false
    val entries = merged.filter(_._1 <= foldMax)
    val gen = prev.map(_._2 + 1).getOrElse(0L)
    val tmp = new Path(dir,
      s".tmp-idx-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = f.create(tmp, true)
    try out.write(entries.map(e => s"${e._1},${e._2}")
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(dir, s"_index.$foldMax.$gen")
    if (!f.rename(tmp, dest)) {
      f.delete(tmp, false) // a rival folded first — their index wins
      return false
    }
    // two-phase cleanup: everything the PREVIOUS index already covers
    // is now covered twice — safe to drop whatever a stale listing
    // might miss of this fold
    prev.foreach { case (prevMax, _, _) =>
      markerEntries.filter(_._1 <= prevMax).foreach(e =>
        LogStore.forPath(table).removeMarker(f, new Path(dir, s"${e._1}")))
      indexes.dropRight(1).foreach(ix =>
        f.delete(new Path(dir, ix._3), false): Unit)
    }
    // r14 ADVICE (vacuum race): a vacuum's dropFromIndex that landed on
    // the index WE folded from (same foldMax, higher gen — the drop
    // never collides with our new name, so neither side's rename retry
    // fires) would have its removals resurrected by this fold. Re-list:
    // if such an index appeared, re-drop the versions it removed from
    // our own (now-newest) index. Together with dropFromIndex's own
    // post-rename re-check this heals every interleaving a non-lagged
    // listing can observe; a store with lagged listings needs a
    // conditional-put LogStore to close the residual window.
    prev.foreach { case (prevMax, prevGen, _) =>
      val rivals = LogStore.forPath(table).listMarkers(f, dir)
        .flatMap(e => e._1 match {
          case IndexRe(m, g) if m.toLong == prevMax && g.toLong > prevGen =>
            Some((g.toLong, e._1))
          case _ => None
        })
      if (rivals.nonEmpty) {
        // only the NEWEST drop generation is authoritative — an older
        // one may still contain versions a newer drop removed
        val stillThere = readIndexFile(spark, table,
          rivals.maxBy(_._1)._2).map(_._1).toSet
        val droppedMeanwhile = prevEntries.map(_._1).toSet -- stillThere
        if (droppedMeanwhile.nonEmpty)
          dropFromIndex(spark, table, droppedMeanwhile)
      }
    }
    true
  }

  /** Drop `removed` versions from the current index (vacuum's hook —
    * a vacuumed version must stop resolving even if folded). Writes a
    * gen-bumped index without them; the old index stays for the
    * two-phase rule and dies at the next fold.
    *
    * r14 ADVICE (medium): a commit-triggered [[checkpointLog]] races
    * this without holding any claim, and because a fold writes a NEW
    * index NAME (higher foldMax), the rename-collision retry below
    * never fires for it — the fold's index, built from the pre-drop
    * listing, would resurrect the vacuumed versions. Two closures:
    * after a successful rewrite the newest index is RE-READ and the
    * drop repeated until it is stable (handles folds that land before
    * our re-check), and [[checkpointLog]] itself refuses to fold a
    * marker-less version whose v= data dir is gone (handles folds that
    * READ after vacuum's deletes). A fold that both read before the
    * deletes and renames after the last re-check here can still slip
    * through — that residual window needs a store-side conditional
    * put to close completely; the next fold's data-dir check heals it.
    */
  private[operators] def dropFromIndex(spark: SparkSession,
      table: String, removed: Set[Long], attempts: Int = 3): Unit = {
    if (removed.isEmpty || attempts <= 0) return
    val f = fs(spark, table)
    val dir = new Path(s"$table/_commits")
    val listed = LogStore.forPath(table).listMarkers(f, dir)
    val indexes = listed.flatMap(e => e._1 match {
      case IndexRe(m, g) => Some((m.toLong, g.toLong, e._1))
      case _ => None
    }).sortBy(x => (x._1, x._2))
    indexes.lastOption.foreach { ix =>
      val cur = readIndexFile(spark, table, ix._3)
      val kept = cur.filterNot(e => removed.contains(e._1))
      if (kept.size < cur.size) {
        val tmp = new Path(dir,
          s".tmp-idx-${java.util.UUID.randomUUID().toString.take(12)}")
        val out = f.create(tmp, true)
        try out.write(kept.map(e => s"${e._1},${e._2}")
          .mkString("\n").getBytes("UTF-8"))
        finally out.close()
        val dest = new Path(dir, s"_index.${ix._1}.${ix._2 + 1}")
        if (!f.rename(tmp, dest)) {
          // a concurrent fold took this gen — its index re-includes
          // the versions we're dropping; rebase onto it and retry
          f.delete(tmp, false): Unit
          dropFromIndex(spark, table, removed, attempts - 1)
        } else {
          // rename won — but a fold may have renamed a HIGHER index
          // built from the pre-drop listing in the meantime. Re-read
          // the newest index; if any removed version resurfaced,
          // re-drop onto it (loop until stable, bounded).
          val after = LogStore.forPath(table).listMarkers(f, dir)
            .flatMap(e => e._1 match {
              case IndexRe(m, g) => Some((m.toLong, g.toLong, e._1))
              case _ => None
            }).sortBy(x => (x._1, x._2))
          after.lastOption.foreach { nx =>
            if (nx._3 != dest.getName &&
                readIndexFile(spark, table, nx._3)
                  .exists(e => removed.contains(e._1)))
              dropFromIndex(spark, table, removed, attempts - 1)
          }
        }
      }
    }
  }

  /** Atomic exclusive create of an empty marker, through the
    * table-scoped [[LogStore]] (POSIX `O_CREAT|O_EXCL` / HDFS
    * namenode-arbitrated create by default; conditional-PUT stores
    * plug in via [[LogStore.install]] — SnapshotSpec drives the full
    * fuzzer through a simulated one with lagged listings).
    */
  private def tryCreateMarker(spark: SparkSession, table: String,
      kind: String, v: Long): Boolean = {
    fs(spark, table).mkdirs(new Path(s"$table/$kind"))
    tryExclusiveCreate(spark, s"$table/$kind/$v")
  }

  /** The raw atomic primitive, exposed for other claim-style markers
    * (e.g. [[DeletionVectors]]' maintenance claim): exclusive create
    * of an empty file at `path`, true iff this caller created it.
    */
  def tryExclusiveCreate(spark: SparkSession, path: String): Boolean =
    LogStore.forPath(path)
      .tryExclusiveCreate(fs(spark, path), new Path(path))

  /** Remove a marker created by [[tryExclusiveCreate]]. */
  def removeMarker(spark: SparkSession, path: String): Unit =
    LogStore.forPath(path).removeMarker(fs(spark, path), new Path(path))

  /** Does a marker exist at `path`? */
  def markerExists(spark: SparkSession, path: String): Boolean =
    LogStore.forPath(path).markerExists(fs(spark, path), new Path(path))

  /** Exclusive claim of a version NUMBER (and with it, sole
    * writership of `v=$v`). False ⇒ someone else holds or held it.
    */
  def tryClaim(spark: SparkSession, table: String, v: Long): Boolean =
    tryCreateMarker(spark, table, "_claims", v)

  private def releaseClaim(spark: SparkSession, table: String,
      v: Long): Unit =
    removeMarker(spark, s"$table/_claims/$v")

  /** The atomic visibility step, exposed for crash-simulation tests:
    * commit version `v` via exclusive marker create. False ⇒ lost the
    * race. Callers of this RAW form (rather than [[publish]] /
    * [[publishAt]]) are responsible for dir exclusivity themselves.
    */
  def tryCommit(spark: SparkSession, table: String, v: Long): Boolean =
    tryCreateMarker(spark, table, "_commits", v)

  /** Writes `df` as the next version and commits it. Returns the
    * committed version number.
    *
    * Data-write discipline: the version number is CLAIMED before any
    * data moves, so a publish that loses the next-version race
    * discovers it on a marker create — before writing — and the
    * expensive part runs exactly once per claimed attempt. The only
    * way a claimed attempt can then lose its COMMIT is a writer that
    * commits raw (direct [[tryCommit]], e.g. the deterministic
    * streaming writers) on a table also served by claim-based
    * publishers — mixing the two write styles on one table is
    * unsupported; in-repo they never share a table.
    *
    * @param onBeforeCommit test-only failpoint between the data write
    *        and the commit marker: SnapshotSpec uses it to inject a
    *        rival commit (claim-lost retry path) and to simulate
    *        crashes in the write→commit window.
    */
  def publish(spark: SparkSession, table: String, df: DataFrame,
      onBeforeCommit: Long => Unit = _ => ()): Long = {
    var committed = -1L
    while (committed < 0) {
      var attempt = latestVersion(spark, table).getOrElse(0L) + 1
      while (!tryClaim(spark, table, attempt))
        attempt = math.max(attempt + 1,
          latestVersion(spark, table).getOrElse(0L) + 1)
      // The claim can be a RECYCLED number: its original owner may have
      // committed and released between our latestVersion read and our
      // claim create. Writing would stomp a COMMITTED directory (two
      // concurrent stale claimers would interleave bytes in it — the
      // corrupt-mix the claims layer exists to prevent, resurfacing one
      // level up). A commit marker always precedes its claim release,
      // so if we could claim a committed version, its marker is already
      // visible — this re-check is race-free. Decline and retry higher.
      if (committedVersions(spark, table).contains(attempt)) {
        releaseClaim(spark, table, attempt)
      } else {
        df.write.mode("overwrite").parquet(s"$table/v=$attempt")
        onBeforeCommit(attempt)
        if (tryCommit(spark, table, attempt)) committed = attempt
        // on a lost commit (raw-committing rival), this attempt's dir is
        // garbage; releasing the claim un-pins it for vacuum
        releaseClaim(spark, table, attempt)
      }
    }
    maybeCheckpoint(spark, table, committed)
    committed
  }

  /** Version-cadence fold trigger shared by the publish faces: every
    * 64th commit folds the log (zero extra listings on the other 63 —
    * the cadence check is arithmetic on the just-committed version).
    * A long-running CDC stream therefore keeps its `_commits` listing
    * bounded at ~64 + lag names without any scheduler.
    */
  private def maybeCheckpoint(spark: SparkSession, table: String,
      v: Long): Unit =
    if (v > 0 && v % 64 == 0) checkpointLog(spark, table): Unit

  /** COMPARE-AND-SWAP publish: commit `df` as version `base + 1` iff
    * `base` is still the maximum committed version — the optimistic-
    * concurrency primitive for tables whose writers derive the next
    * state FROM the current one (e.g. a [[DeletionVectors]] manifest:
    * next = f(latest)). [[publish]] is last-writer-wins — two racing
    * publishers each build on their own stale read and the loser's
    * change silently vanishes; publishCas instead returns false so
    * the caller re-reads the new latest and REBASES.
    *
    * Soundness (all-CAS writer contract): the claim on `base + 1` is
    * the lock — once held, no other CAS writer can commit base + 1
    * (needs our claim) nor any higher version (a CAS of base + k
    * first requires base + k - 1 committed, inductively blocked), so
    * the post-claim re-check of max-committed == base is stable
    * through our commit. A table mixing CAS writers with racing
    * [[publish]] / raw [[tryCommit]] writers forfeits this — same
    * rule as the publishAt/publish separation.
    */
  def publishCas(spark: SparkSession, table: String, base: Long,
      df: DataFrame): Boolean = {
    if (latestVersion(spark, table).getOrElse(0L) != base) return false
    val v = base + 1
    if (!tryClaim(spark, table, v)) return false
    // the claim may be a recycled number (owner committed + released
    // before our check) or a rival may have committed base+1.. between
    // our latest read and the claim — re-check under the claim
    if (latestVersion(spark, table).getOrElse(0L) != base) {
      releaseClaim(spark, table, v)
      return false
    }
    df.write.mode("overwrite").parquet(s"$table/v=$v")
    val won = tryCommit(spark, table, v)
    releaseClaim(spark, table, v)
    if (won) maybeCheckpoint(spark, table, v)
    won
  }

  /** Deterministic-version publish for single-writer replayable
    * producers (streaming foreachBatch: version = batchId + 1).
    * Returns false as a no-op if `v` is already committed (replay of
    * a committed batch). A claim left by this writer's own crashed
    * attempt is ADOPTED — single-writer determinism means a live
    * claim on `v` can only be ours — so replay deterministically
    * overwrites the debris and commits.
    */
  def publishAt(spark: SparkSession, table: String, v: Long,
      df: DataFrame): Boolean = {
    if (committedVersions(spark, table).contains(v)) false
    else {
      tryClaim(spark, table, v): Unit // adopt our own crashed claim
      df.write.mode("overwrite").parquet(s"$table/v=$v")
      val won = tryCommit(spark, table, v)
      releaseClaim(spark, table, v)
      if (won) maybeCheckpoint(spark, table, v)
      won
    }
  }

  def readVersion(spark: SparkSession, table: String, v: Long): DataFrame = {
    require(committedVersions(spark, table).contains(v),
      s"version $v of $table was never committed")
    spark.read.parquet(s"$table/v=$v")
  }

  def readLatest(spark: SparkSession, table: String): DataFrame = {
    val v = latestVersion(spark, table)
      .getOrElse(sys.error(s"no committed version in $table"))
    spark.read.parquet(s"$table/v=$v")
  }

  /** Deletes data for all but the newest `keep` committed versions,
    * plus uncommitted debris at or below the max committed version —
    * EXCEPT dirs with a live claim (an in-flight claim-based publish
    * that a raw-committing rival has already passed; deleting it
    * would commit a dataless version moments later). An uncommitted
    * dir ABOVE max committed may be an in-flight publish and is left
    * alone regardless. Markers of vacuumed versions are removed too,
    * so time travel to them fails fast rather than reading missing
    * data. Claims are never vacuumed (see object doc).
    */
  def vacuum(spark: SparkSession, table: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the latest version")
    val f = fs(spark, table)
    val committed = committedVersions(spark, table)
    if (committed.isEmpty) return
    val max = committed.last
    val keepSet = committed.takeRight(keep).toSet
    val claimed = claimedVersions(spark, table).toSet
    val dataDirs = f.listStatus(new Path(table)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
    val removed = Set.newBuilder[Long]
    for (v <- dataDirs
         if v <= max && !keepSet.contains(v)
         && !(claimed.contains(v) && !committed.contains(v))) {
      f.delete(new Path(s"$table/v=$v"), true)
      removeMarker(spark, s"$table/_commits/$v")
      removed += v
    }
    // folded versions resolve from the index, not markers — a
    // vacuumed one must stop resolving there too (fail-fast time
    // travel, unchanged semantics)
    dropFromIndex(spark, table, removed.result())
  }
}
