package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.{BloomMath, GraftFunctions}

/** File-skipping sidecar index: per-file (min, max, bloom) statistics
  * over a key column, for needle-in-a-haystack point lookups on a key
  * the sink is NOT partitioned or clustered by.
  *
  * The gap this closes: partition pruning serves the partition column,
  * z-ordering serves the clustered columns' min/max — but a lookup by
  * an UNCLUSTERED key (find these 15 order keys in a hash-laid-out
  * 100 TB sink) matches every file's [min, max] and degrades to a full
  * scan. A per-file bloom filter keeps O(bytes-per-file) state that
  * answers "definitely not here" for arbitrary keys — the design
  * Delta/Iceberg ship as file-level stats + bloom sidecars, and what
  * parquet's own row-group blooms do one level down (those nest inside
  * this: the sidecar prunes FILES without opening them, the row-group
  * bloom then prunes pages inside the files that survive).
  *
  * Scale shape:
  *  - [[build]] is one metadata-column aggregation over the sink
  *    (map-side partial per file split, tiny shuffle of per-file
  *    states) writing ~kilobytes per data file;
  *  - [[lookup]] filters the sidecar with the native codegen'd
  *    [[graft.functions.BloomHitsAny]] probe — a DISTRIBUTED scan of
  *    the sidecar table (at 100 TB the sidecar is itself millions of
  *    rows, never driver state), collects only the surviving file
  *    NAMES (bounded: actual hits + false positives), and reads
  *    exactly those files;
  *  - false positives cost a wasted file read, never a wrong answer —
  *    the final in-file filter re-applies the exact predicate; the
  *    oracle gate on `index_point_lookup` pins that end to end.
  */
object SkippingIndex {

  /** Bloom build: typed Aggregator folding int64 keys into a fixed
    * m-bit filter ([[BloomMath]] double hashing, k = [[BloomMath.K]]).
    * Size m by expected distinct keys per file: m ≈ 14.4·n gives
    * ~0.8% fpp at k=4 (1 MB sidecar row per ~580 K keys).
    */
  final class BloomBuildAgg(mBits: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(mBits % 8 == 0, "mBits must be byte-aligned")
    def zero: Array[Byte] = new Array[Byte](mBits / 8)
    def reduce(b: Array[Byte], key: Long): Array[Byte] = {
      BloomMath.set(b, key); b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the sidecar for `dataPath` over int64 column `keyCol` and
    * write it to `indexPath`: one row per data file,
    * (file, min_key, max_key, n_rows, bloom).
    */
  def build(spark: SparkSession, dataPath: String, indexPath: String,
      keyCol: String, mBits: Int = 1 << 18): Unit =
    buildStats(spark, spark.read.parquet(dataPath), indexPath, keyCol, mBits)

  /** Per-file stats rows (file, min_key, max_key, n_rows, bloom) of a
    * scan, as a DataFrame — the shared aggregation behind [[build]]/
    * [[buildStats]] and [[DeletionVectors.refreshIndex]]'s incremental
    * maintenance (which computes stats for NEW files only).
    */
  def statsOf(spark: SparkSession, scan: DataFrame, keyCol: String,
      mBits: Int = 1 << 18): DataFrame = {
    val bloomAgg = udaf(new BloomBuildAgg(mBits), Encoders.scalaLong)
    scan
      .select(col("_metadata.file_path").as("file"), col(keyCol).as("k"))
      .groupBy("file")
      .agg(min(col("k")).as("min_key"), max(col("k")).as("max_key"),
        count(lit(1)).as("n_rows"), bloomAgg(col("k")).as("bloom"))
  }

  /** [[build]] over an explicit scan — the form a
    * [[DeletionVectors]] table uses to index only its LIVE manifest
    * files ([[DeletionVectors.rawScan]]).
    */
  def buildStats(spark: SparkSession, scan: DataFrame, indexPath: String,
      keyCol: String, mBits: Int = 1 << 18): Unit =
    statsOf(spark, scan, keyCol, mBits)
      .write.mode("overwrite").parquet(indexPath)

  /** Candidate live files for `keys` from a sidecar at `indexPath` —
    * the probe half of [[lookup]], exposed for reads that need their
    * own final filter (e.g. the DV-masked composition).
    */
  def candidates(spark: SparkSession, indexPath: String,
      keys: Seq[Long]): (Seq[String], Long) = {
    require(keys.nonEmpty, "empty probe key set")
    val idx = spark.read.parquet(indexPath)
    val keyLit = array(keys.map(lit(_)): _*)
    val inRange = keys.map(k =>
      lit(k).between(col("min_key"), col("max_key"))).reduce(_ || _)
    val hit = inRange &&
      GraftFunctions.bloomHitsAny(spark, col("bloom"), keyLit)
    // ONE distributed pass: candidate names (bounded: hits + false
    // positives) and the sidecar size come out of the same aggregate —
    // the serving path used to pay a second full sidecar scan just to
    // report its size. Sorted because collect_list order is
    // partition-race-dependent.
    val row = idx
      .agg(collect_list(when(hit, col("file"))).as("cands"),
        count(lit(1)).as("total"))
      .head()
    (row.getSeq[String](0).sorted, row.getLong(1))
  }

  /** Point lookup: scan the sidecar for candidate files (min/max range
    * test + bloom probe, both inside one codegen'd filter), then read
    * only those files with the exact predicate re-applied.
    *
    * Returns (result, candidateFiles, totalFiles) so callers/probes
    * can assert the skipping ratio — the deterministic metric that
    * carries the capability (wall clock on a warm local FS does not).
    */
  def lookup(spark: SparkSession, dataPath: String, indexPath: String,
      keyCol: String, keys: Seq[Long]): (DataFrame, Seq[String], Long) = {
    val (cands, total) = candidates(spark, indexPath, keys)
    val result =
      if (cands.isEmpty)
        spark.read.parquet(dataPath).filter(col(keyCol).isin(keys: _*)).limit(0)
      else spark.read.option("basePath", dataPath)
        .parquet(cands: _*)
        .filter(col(keyCol).isin(keys: _*))
    (result, cands, total)
  }
}
