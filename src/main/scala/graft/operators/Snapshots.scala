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
  *   table/_commits/1 _commits/3  one empty marker per COMMITTED version
  * }}}
  *
  * The committed state is defined ONLY by `_commits/`: a version is
  * visible iff its marker exists, and the current table is the max
  * committed version. The single atomic primitive is EXCLUSIVE CREATE
  * of the marker (`FileSystem.create(path, overwrite=false)`) — atomic
  * on HDFS and local filesystems, and on object stores with
  * conditional-put (S3 If-None-Match); nothing here relies on atomic
  * rename or directory listing consistency. Consequences:
  *
  *  - a writer that dies after writing `v=N/` but before the marker
  *    leaves invisible garbage, never a corrupt table (readers still
  *    resolve max committed < N);
  *  - two concurrent publishers racing to version N: exactly one
  *    exclusive-create wins; the loser's data dir is superseded
  *    garbage and its publish retries at N+1 — optimistic concurrency
  *    without a lock service;
  *  - time travel is just reading `v=K` for any committed K;
  *  - `vacuum(keep)` may delete data of old committed versions and any
  *    uncommitted dir with version ≤ max committed (a dir ABOVE max
  *    committed may belong to an in-flight publish and is left alone).
  *
  * Scale note: the protocol's cost is O(1) small-file operations per
  * publish plus one `_commits` listing per read — independent of data
  * volume; the data write itself is whatever the DataFrame costs.
  */
object Snapshots {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def committedVersions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val commits = new Path(s"$table/_commits")
    if (!f.exists(commits)) Seq.empty
    else f.listStatus(commits).toSeq
      .map(_.getPath.getName)
      .filter(_.forall(_.isDigit))
      .map(_.toLong)
      .sorted
  }

  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    committedVersions(spark, table).lastOption

  /** Writes `df` as the next version and commits it. Returns the
    * committed version number. Retries the version claim (never the
    * data write per claim) if another publisher wins the race.
    */
  def publish(spark: SparkSession, table: String, df: DataFrame): Long = {
    var attempt = latestVersion(spark, table).getOrElse(0L) + 1
    var committed = -1L
    while (committed < 0) {
      df.write.mode("overwrite").parquet(s"$table/v=$attempt")
      if (tryCommit(spark, table, attempt)) committed = attempt
      else attempt = math.max(attempt + 1,
        latestVersion(spark, table).getOrElse(0L) + 1)
    }
    committed
  }

  /** The atomic step, exposed for crash-simulation tests: claim
    * version `v` via exclusive marker create. False ⇒ lost the race.
    */
  def tryCommit(spark: SparkSession, table: String, v: Long): Boolean = {
    val f = fs(spark, table)
    f.mkdirs(new Path(s"$table/_commits"))
    try {
      f.create(new Path(s"$table/_commits/$v"), false).close()
      true
    } catch {
      case _: java.io.IOException => false
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
    * plus uncommitted debris at or below the max committed version
    * (an uncommitted dir ABOVE it may be an in-flight publish).
    * Markers of vacuumed versions are removed too, so time travel to
    * them fails fast rather than reading missing data.
    */
  def vacuum(spark: SparkSession, table: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the latest version")
    val f = fs(spark, table)
    val committed = committedVersions(spark, table)
    if (committed.isEmpty) return
    val max = committed.last
    val keepSet = committed.takeRight(keep).toSet
    val dataDirs = f.listStatus(new Path(table)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
    for (v <- dataDirs if v <= max && !keepSet.contains(v)) {
      f.delete(new Path(s"$table/v=$v"), true)
      f.delete(new Path(s"$table/_commits/$v"), false)
    }
  }
}
