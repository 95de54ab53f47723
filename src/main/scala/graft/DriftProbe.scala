package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Measures the streaming drift monitor's incremental-maintenance
  * claim: per-batch wall time must track BATCH size + vocabulary, not
  * the accumulated corpus — feeding N equal-sized drops should give
  * ~flat per-batch cost, where an O(history) implementation would grow
  * linearly (the shape the round-6 SCD2 change-log finding had).
  *
  * Drops are equal-sized slices of the sf documents table; each drop
  * is one micro-batch (AvailableNow over one new file per run).
  * Prints per-batch wall seconds + the accumulated corpus size it
  * would have re-read if it were O(history).
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val slices = sys.env.getOrElse("SPARK_GRAFT_DRIFT_SLICES", "6").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val root = java.nio.file.Files.createTempDirectory("graft_driftprobe").toString
    val (drop, ckpt, table) = (s"$root/drop", s"$root/ckpt", s"$root/counts")
    new java.io.File(drop).mkdirs()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val total = docs.count()

    (0 until slices).foreach { k =>
      val stage = s"$root/stage_$k"
      docs.filter(pmod(col("doc_id"), lit(slices)) === k)
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(drop, f"d$k%02d.parquet"))
      val t0 = System.nanoTime()
      val q = graft.streaming.Streaming.monitorDrift(
        graft.sources.Tables.documentsStream(spark, drop), ckpt, table,
        Trigger.AvailableNow(), keepVersions = 2)
      q.awaitTermination(300000)
      q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val accDocs = total * (k + 1) / slices
      System.err.println(
        f"[driftprobe] batch ${k + 1}/$slices: $secs%6.2fs  (accumulated corpus $accDocs docs; batch ${total / slices} docs)")
    }
    val report = graft.streaming.Streaming.latestDriftReport(spark, table)
    System.err.println(s"[driftprobe] final report rows: ${report.count()}")
    spark.stop()
  }
}
