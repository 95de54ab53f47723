package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for a hive-partitioned parquet sink (the
  * warehouse-maintenance face that pairs with `zorder_cluster` and
  * `sink_partitioned` — what Delta/Iceberg ship as OPTIMIZE /
  * rewrite_data_files).
  *
  * A streaming or micro-batch producer fragments a partitioned sink
  * into per-batch slivers; at 100 TB the file COUNT, not the bytes,
  * becomes the bottleneck (listing cost, scan task startup, parquet
  * footer overhead). Compaction bin-packs each partition's bytes into
  * ⌈bytes/target⌉ files without changing row content.
  *
  * Scale shape:
  *  - planning is METADATA-only: one FS listing (the same O(#files)
  *    walk any table service does), never a data collect;
  *  - execution is ONE shuffle sized by the data: each row routes to a
  *    global bin id = partition's bin offset + hash(row) % partition's
  *    bin count, carried by a BROADCAST join against the tiny
  *    per-partition plan frame (partitions × 3 columns);
  *  - `repartition(totalBins, gbin)` hash-places whole bins; a task
  *    holding k bins of one partition writes k files into that
  *    partition directory, so per-directory file count ≤ bin count
  *    (collisions only MERGE output into fewer, larger files — the
  *    benign direction; CompactionSpec pins the envelope).
  *
  * Content invariance is the oracle contract: the compacted sink must
  * aggregate identically to the pre-fragmentation source
  * (`compact_files` hash-gates that against DuckDB over the original
  * table).
  */
object Compaction {

  import org.apache.spark.sql.Column

  /** Interleave a 16-bit value's bits with zeros (the Morton spread):
    * column arithmetic only, so the whole layout key stays inside
    * whole-stage codegen — no UDF, no custom Expression
    * (shiftleft/and/or all compile into the same generated stage).
    */
  private def spreadBits16(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton (Z-order) code: interleaves the bits of two 16-bit
    * keys so lexicographic order on the code is locality-preserving in
    * BOTH dimensions.
    */
  def morton2(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Scales a key from [minV, maxV] onto the full 16-bit Morton
    * domain. Without this, keys of different magnitudes interleave
    * unfairly: raw (l_partkey ≤ 20000, l_suppkey ≤ 1000) puts
    * partkey's bits 10+ ABOVE every suppkey bit, so a z-sort is just
    * a partkey sort and the second dimension gets no locality at all
    * (measured: 16/16 files hit). Same normalization step Delta's
    * OPTIMIZE ZORDER applies (range-bound scaling) before
    * interleaving. Integer arithmetic only — no float rounding in the
    * layout key.
    *
    * Overflow discipline (layout-only, but a wrapped z-key silently
    * scrambles the clustering the caller paid for): multiply-first is
    * EXACT but `(c-min)*65535` wraps once the column range exceeds
    * Long.MaxValue/65535 ≈ 1.4e14, so wider ranges divide first
    * (step = ⌊range/65535⌋+1, result ≤ 65535 by construction — the
    * stretch the multiply path buys is irrelevant there because the
    * divided key already spans the full 16-bit domain). If the range
    * ITSELF overflows a long (min ≪ 0 < max, spans > 2^63 — shows up
    * as a negative range), fall back to double-space scaling: ~2^-52
    * relative error on a 2^63 domain perturbs only the lowest
    * interleave bits, harmless for file-level clustering.
    */
  def normalize16(c: Column, minV: Column, maxV: Column): Column = {
    val cl = c.cast("long")
    // try_subtract: NULL instead of an ANSI overflow error when the
    // range itself spans more than a long (min ≪ 0 < max)
    val range = try_subtract(maxV.cast("long"), minV.cast("long"))
    val exact = (cl - minV) * 65535L / greatest(range, lit(1L))
    val wide = (cl - minV) / (range / 65535L + lit(1L))
    val overflowed = ((cl.cast("double") - minV.cast("double")) /
      (maxV.cast("double") - minV.cast("double")) * 65535d).cast("long")
    when(range.isNotNull && range <= lit(Long.MaxValue / 65535L), exact)
      .when(range.isNotNull, wide)
      .otherwise(overflowed)
  }

  /** Per-partition-directory stats from one FS listing. */
  final case class PartStats(value: String, files: Int, bytes: Long)

  def listPartitions(spark: SparkSession, path: String,
      partitionCol: String): Seq[PartStats] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .map { dir =>
        val files = fs.listStatus(dir.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartStats(dir.getPath.getName.drop(partitionCol.length + 1),
          files.length, files.map(_.getLen).sum)
      }.toSeq.sortBy(_.value)
  }

  /** Bin-pack `inPath` (hive-partitioned by string column
    * `partitionCol`) into `outPath` with ~`targetBytes` files, and
    * return the compacted sink as a DataFrame.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      partitionCol: String, targetBytes: Long): DataFrame = {
    val stats = listPartitions(spark, inPath, partitionCol)
    require(stats.nonEmpty, s"no $partitionCol=* partitions under $inPath")
    var off = 0L
    val plan = stats.map { s =>
      val n = math.max(1L, (s.bytes + targetBytes - 1) / targetBytes)
      val row = (s.value, off, n)
      off += n
      row
    }
    val totalBins = off
    import spark.implicits._
    val df = spark.read.option("basePath", inPath).parquet(inPath)
    // partition values arrive as directory-name STRINGS; cast the plan
    // frame to the sink's actual partition type so compaction also
    // serves long-partitioned state layouts (Scd2Log buckets, AnnIndex
    // inverted lists), not just string-partitioned warehouse sinks
    val planDf = plan.toDF(partitionCol, "bin_off", "bin_n")
      .withColumn(partitionCol,
        col(partitionCol).cast(df.schema(partitionCol).dataType))
    val dataCols = df.columns.filterNot(_ == partitionCol).map(col)
    df.join(broadcast(planDf), Seq(partitionCol))
      .withColumn("gbin", col("bin_off") + pmod(xxhash64(dataCols: _*), col("bin_n")))
      .repartition(totalBins.toInt, col("gbin"))
      .drop("gbin", "bin_off", "bin_n")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(outPath)
    spark.read.parquet(outPath)
  }
}
