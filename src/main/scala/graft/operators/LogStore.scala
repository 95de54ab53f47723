package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable atomic-marker store for the snapshot commit protocol —
  * the Delta `LogStore` shape. [[Snapshots]]' entire correctness
  * stands on two store properties:
  *
  *  1. '''atomic create-if-absent''' of a marker (the claim/commit
  *     primitive);
  *  2. '''marker visibility''' for readers (listing `_commits/` to
  *     resolve the latest version, exact-key existence checks).
  *
  * Different storage systems supply these differently: POSIX gives
  * `O_CREAT|O_EXCL`, HDFS gives namenode-arbitrated
  * `create(overwrite=false)`, S3-class object stores give
  * conditional PUT (`If-None-Match: *`) with read-after-write
  * consistent GETs — and, on legacy stores, LAGGED listings. This
  * trait isolates exactly those two properties so the protocol runs
  * unchanged over any of them; SnapshotSpec drives the full
  * publish/crash/vacuum fuzzer through a simulated
  * conditional-put-with-lagged-listing store to pin that claim.
  *
  * Resolution is PER PATH PREFIX: production paths use [[Default]]
  * (the existing POSIX/HDFS primitives — behavior unchanged);
  * [[LogStore.install]] scopes an alternative store to one table
  * root, so concurrently-running suites and sessions never see each
  * other's stores.
  */
trait LogStore {

  /** Atomic create-if-absent of an empty marker; true iff created. */
  def tryExclusiveCreate(f: FileSystem, marker: Path): Boolean

  def removeMarker(f: FileSystem, marker: Path): Unit

  /** Exact-key existence — read-after-write consistent on every
    * real store (S3 GET included).
    */
  def markerExists(f: FileSystem, marker: Path): Boolean

  /** (name, create-instant millis) of the markers under `dir` —
    * empty if absent. Implementations over eventually-consistent
    * LISTs must compensate internally (e.g. exact-key forward
    * probing from the listed frontier), because [[Snapshots]] treats
    * the result as the committed truth.
    */
  def listMarkers(f: FileSystem, dir: Path): Seq[(String, Long)]
}

object LogStore {

  /** POSIX / HDFS primitives — what every production path uses (and
    * used before the abstraction; byte-for-byte the same semantics).
    */
  object Default extends LogStore {

    override def tryExclusiveCreate(f: FileSystem,
        marker: Path): Boolean =
      if (f.getUri.getScheme == "file") {
        // Hadoop's local create(overwrite=false) is check-then-act;
        // POSIX O_CREAT|O_EXCL via NIO is the real atomic
        try {
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(marker.toUri.getPath))
          true
        } catch { case _: java.io.IOException => false }
      } else {
        try { f.create(marker, false).close(); true }
        catch { case _: java.io.IOException => false }
      }

    override def removeMarker(f: FileSystem, marker: Path): Unit = {
      f.delete(marker, false): Unit
    }

    override def markerExists(f: FileSystem, marker: Path): Boolean =
      f.exists(marker)

    override def listMarkers(f: FileSystem,
        dir: Path): Seq[(String, Long)] =
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).toSeq
        .map(s => (s.getPath.getName, s.getModificationTime))
  }

  private val overrides = new ConcurrentHashMap[String, LogStore]()

  /** Route every marker under `pathPrefix` to `store` (tests,
    * alternative deployments). Longest-prefix wins.
    */
  def install(pathPrefix: String, store: LogStore): Unit =
    overrides.put(pathPrefix, store): Unit

  def uninstall(pathPrefix: String): Unit =
    overrides.remove(pathPrefix): Unit

  def forPath(path: String): LogStore =
    if (overrides.isEmpty) Default // the zero-cost production path
    else {
      var best: String = null
      val it = overrides.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (path.startsWith(k) && (best == null || k.length > best.length))
          best = k
      }
      if (best == null) Default else overrides.get(best)
    }
}
