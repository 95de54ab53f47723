package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 3 produced an EMPTY correctness file: the host is
  * subject to ~15x contention windows (see Bench.scala), and the old
  * Verify wrote oracle_sql.json only at the END — a driver timeout
  * mid-run left nothing to grade. Now:
  *  - oracle_sql.json is written FIRST (grading metadata survives a kill)
  *  - each query runs under a watchdog (SPARK_GRAFT_QUERY_TIMEOUT_SEC,
  *    default 180): job group cancelled, thread abandoned if needed
  *  - per-query progress on stderr so a killed run leaves evidence
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val queryTimeoutMs =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "180").toLong * 1000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // optional comma-separated filter for local iteration (the driver
    // never sets it — all queries run in the gate)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    val watchdog = new java.util.Timer("verify-watchdog", true)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val group = s"verify-$name"
        val qt0 = System.nanoTime()
        val ok = new java.util.concurrent.atomic.AtomicBoolean(false)
        val runner = new Thread(() => {
          spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            ok.set(true)
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          } finally spark.sparkContext.clearJobGroup()
        }, s"verify-run-$name")
        runner.setDaemon(true)
        val cancel = new java.util.TimerTask {
          def run(): Unit = {
            System.err.println(s"[verify] $name watchdog fired, cancelling jobs")
            try spark.sparkContext.cancelJobGroup(group) catch { case _: Throwable => () }
          }
        }
        watchdog.schedule(cancel, queryTimeoutMs)
        runner.start()
        runner.join(queryTimeoutMs + 30000L)
        cancel.cancel()
        if (runner.isAlive)
          System.err.println(s"[verify] $name run thread abandoned (uncancellable)")
        val dt = (System.nanoTime() - qt0) / 1e9
        System.err.println(
          f"[verify] $name%-28s ${if (ok.get) "ok" else "FAIL"}%-4s $dt%7.2fs (elapsed=$elapsed%.0fs)")
        // drop per-query persisted frames (shingle/hash-set caches):
        // 70+ queries in one JVM would otherwise accumulate storage
        // memory for the whole run
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
    }
    System.err.println(f"[verify] all queries done at elapsed=$elapsed%.0fs")
    spark.stop()
  }
}
