package graft

import java.util.concurrent.ConcurrentHashMap

import scala.collection.JavaConverters._

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.operators.LogStore

/** Simulated S3-class marker store for SnapshotSpec's fault
  * injection: the atomic primitive is a CONDITIONAL PUT against the
  * store's own object index (`putIfAbsent` — no POSIX
  * `O_CREAT|O_EXCL`, no HDFS namenode), exact-key GETs are
  * read-after-write consistent (S3's contract), and LISTINGS LAG by
  * `listLagMs` (the legacy-object-store hazard). The listing
  * compensates the lag the way real S3 commit services do: from the
  * lagged LIST's numeric frontier it probes FORWARD with exact-key
  * GETs (gap-bounded), so sequentially-numbered commit/claim markers
  * created moments ago are still found — the protocol's reads stay
  * correct without requiring a consistent LIST.
  */
class SimulatedObjectStore(listLagMs: Long,
    probeGap: Int = 32) extends LogStore {

  // the object index: absolute key -> create instant. Values are
  // java.lang.Long ON PURPOSE: a scala.Long-valued CHM unboxes a
  // missing key's null to 0L, turning every miss into a hit
  private val objects = new ConcurrentHashMap[String, java.lang.Long]()
  /** conditional-put attempts (telemetry for the spec). */
  val puts = new java.util.concurrent.atomic.AtomicLong(0L)

  private def key(p: Path): String = p.toUri.getPath

  override def tryExclusiveCreate(f: FileSystem, marker: Path): Boolean = {
    puts.incrementAndGet()
    objects.putIfAbsent(key(marker),
      java.lang.Long.valueOf(System.currentTimeMillis())) == null
  }

  override def removeMarker(f: FileSystem, marker: Path): Unit = {
    objects.remove(key(marker)): Unit
  }

  override def markerExists(f: FileSystem, marker: Path): Boolean =
    objects.containsKey(key(marker)) // exact-key GET: consistent

  override def listMarkers(f: FileSystem,
      dir: Path): Seq[(String, Long)] = {
    val d = key(dir)
    val now = System.currentTimeMillis()
    val all = objects.entrySet().asScala.toSeq
      .filter { e =>
        val k = e.getKey
        k.startsWith(d + "/") && !k.drop(d.length + 1).contains('/')
      }
      .map(e => (e.getKey.drop(d.length + 1), e.getValue.longValue()))
    // the LAGGED list: entries younger than the lag are invisible
    val visible = all.filter(_._2 + listLagMs <= now)
    // forward probing from the visible numeric frontier via
    // exact-key GETs — finds sequential markers the LIST still hides
    val numericVisible = visible.map(_._1).filter(n =>
      n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
    val found = Seq.newBuilder[(String, Long)]
    var v = numericVisible.sorted.lastOption.getOrElse(0L)
    var gap = 0
    while (gap <= probeGap) {
      v += 1
      val k = s"$d/$v"
      val at = objects.get(k)
      if (at ne null) { found += ((v.toString, at.longValue())); gap = 0 }
      else gap += 1
    }
    (visible ++ found.result()).distinct
  }
}
