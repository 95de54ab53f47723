package graft.operators

import org.apache.hadoop.fs.Path
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
  * Three failure modes this implementation closes that naive ones hit:
  *
  *  1. '''All-victim partitions''': a partition whose rows are ALL
  *     victims produces zero output rows, so dynamic overwrite never
  *     touches it and the data would survive its own deletion.
  *     [[erase]] detects emptied partitions and deletes their
  *     directories explicitly.
  *  2. '''Escaped partition values''': Spark Hive-escapes special
  *     characters in partition directory names (space, colon, '%', …
  *     become `%XX`), and partition-column type inference can
  *     re-render values on read (`part=01` read back as int `1`).
  *     String-building `s"\$path/\$partCol=\$v"` from an in-memory
  *     value therefore misses such directories and a fully-victim
  *     partition silently survives. [[erase]] disables partition type
  *     inference for its reads (values round-trip as the literal
  *     directory strings) and resolves physical directories by
  *     LISTING the sink and matching DECODED names, never by
  *     re-encoding paths itself.
  *  3. '''Mid-rewrite crash window''': reading and dynamically
  *     overwriting the same path in one job means a crash mid-write
  *     can leave a partition half-replaced while the job was still
  *     consuming it. [[erase]] localCheckpoints the kept rows BEFORE
  *     the overwrite — the same stage-then-replace discipline as
  *     [[graft.streaming.Scd2Log.compact]] — so the rewrite job never
  *     reads the directories it is replacing, and a crash before the
  *     overwrite leaves the sink untouched (rerun-safe).
  *
  * @return the affected partition values (rewritten or removed),
  *         as decoded directory-value strings
  */
object Erasure {

  /** Decode Hive/Spark partition-path escaping: `%XX` → the char with
    * hex code XX (the inverse of what Spark applies when writing
    * `part=<value>` directory names; see Spark's
    * `ExternalCatalogUtils.escapePathName`). Malformed sequences pass
    * through verbatim, matching Spark's own lenient unescape.
    */
  private[graft] def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append((Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** List the physical `partCol=<encoded>` directories under `path`,
    * keyed by their DECODED partition value. This is the only way to
    * locate a partition directory that is robust to escaping: the
    * mapping decoded→encoded is applied by Spark at write time, so we
    * recover it from what is actually on disk instead of re-deriving
    * it.
    */
  private def physicalDirs(spark: SparkSession, path: String,
      partCol: String): Map[String, Path] = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) Map.empty
    else fs.listStatus(hp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .map { s =>
        val enc = s.getPath.getName.stripPrefix(s"$partCol=")
        unescapePathName(enc) -> s.getPath
      }.toMap
  }

  /** Run `body` with partition-column type inference disabled, so
    * partition values read back as the literal (decoded) directory
    * strings and `part=01` cannot silently become int `1`.
    */
  private def withStringPartitions[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** @param beforeOverwrite test-only failpoint, invoked after the
    *        kept rows are staged (localCheckpointed) and before the
    *        dynamic overwrite. ErasureSpec uses it to simulate a kill
    *        in the stage→overwrite window (sink must be untouched,
    *        rerun must repair) and to delete the source directories
    *        mid-flight (the overwrite must not be reading them).
    */
  def erase(spark: SparkSession, path: String, partCol: String,
      keyCol: String, victims: DataFrame,
      beforeOverwrite: () => Unit = () => ()): Seq[String] =
    withStringPartitions(spark) {
      val table = spark.read.parquet(path)
      val affected = table
        .join(broadcast(victims), Seq(keyCol), "left_semi")
        .select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      if (affected.nonEmpty) {
        val slice = table.filter(col(partCol).isInCollection(affected))
        val kept = slice.join(broadcast(victims), Seq(keyCol), "left_anti")
          // partition column must come last for partitionBy round-trip
          .select(table.columns.filter(_ != partCol).map(col)
            :+ col(partCol): _*)
          // cluster the rewrite by its partition value (round 15):
          // without it every staging task holds rows of every affected
          // partition and the overwrite emits tasks×partitions sliver
          // files (guide §6 small-files). REBALANCE (not a plain
          // repartition) so AQE coalesces tiny partitions AND splits a
          // skewed one across tasks at scale.
          .hint("rebalance", col(partCol))
          // stage BEFORE replacing: the overwrite job must never read
          // the directories it is about to rewrite (crash-window
          // discipline shared with Scd2Log.compact)
          .localCheckpoint(true)
        val surviving = kept.select(col(partCol).cast("string")).distinct()
          .collect().map(_.getString(0)).toSet
        beforeOverwrite()
        kept.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partCol).parquet(path)
        // fully-victim partitions: dynamic overwrite saw no input rows
        // for them — locate their PHYSICAL directories by listing and
        // decoding (never by string-building an escaped path) and
        // remove them, or the data outlives its own deletion. Hadoop
        // FS API, so the same code runs on HDFS/object stores.
        val dirs = physicalDirs(spark, path, partCol)
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        affected.filterNot(surviving).foreach { v =>
          dirs.get(v).foreach(dir => fs.delete(dir, true): Unit)
        }
      }
      affected
    }
}
