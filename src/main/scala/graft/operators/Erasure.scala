package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted row erasure from a partitioned parquet sink — the
  * right-to-be-forgotten operation (GDPR art. 17) a warehouse needs
  * once per-user data lands in it. Deletion is a REWRITE problem on
  * immutable storage: the operator rewrites exactly the partitions
  * that contain a victim row and leaves every other partition's files
  * untouched (byte-identical — ErasureSpec pins it), so cost is
  * O(affected partitions), not O(table).
  *
  * Shape at 100 TB: the deletion list is human-scale (requests, not
  * corpus) — it broadcasts; affected-partition discovery is one
  * semi-join projected to the partition column; the rewrite reads
  * only those partitions back (partition pruning on the scan) and
  * anti-joins the broadcast list. The driver-side `collect()` of
  * affected partition VALUES is bounded by partition count — the
  * same bounded-metadata exception as SCD2's touched-bucket list.
  *
  * The dynamic-overwrite edge case that silently breaks naive
  * implementations: a partition whose rows are ALL victims produces
  * zero output rows, so dynamic overwrite never touches it and the
  * data would survive its own deletion. [[erase]] detects emptied
  * partitions and deletes their directories explicitly.
  *
  * @return the affected partition values (rewritten or removed)
  */
object Erasure {

  def erase(spark: SparkSession, path: String, partCol: String,
      keyCol: String, victims: DataFrame): Seq[String] = {
    val table = spark.read.parquet(path)
    val affected = table
      .join(broadcast(victims), Seq(keyCol), "left_semi")
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (affected.nonEmpty) {
      val slice = table.filter(col(partCol).isInCollection(affected))
      val kept = slice.join(broadcast(victims), Seq(keyCol), "left_anti")
        // partition column must come last for partitionBy round-trip
        .select(table.columns.filter(_ != partCol).map(col) :+ col(partCol): _*)
      val surviving = kept.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(path)
      // fully-victim partitions: dynamic overwrite saw no input rows
      // for them — remove the directories, or the data outlives its
      // own deletion (Hadoop FS API, so the same code runs on
      // HDFS/object stores, not just local disk)
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.filterNot(surviving).foreach { v =>
        val dir = new org.apache.hadoop.fs.Path(s"$path/$partCol=$v")
        if (fs.exists(dir)) fs.delete(dir, true): Unit
      }
    }
    affected
  }
}
