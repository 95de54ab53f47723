package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.ScaleQueries
import graft.sources.Tables

/** Z-order layout property: a file-level bounding box stays small in
  * BOTH clustered dimensions, so a box predicate intersects far fewer
  * files than under a single-column sort. This is exactly the property
  * parquet min/max stats skipping exploits — measured here directly
  * from the written files rather than asserted on reader internals.
  */
class ZOrderSpec extends SparkSpec {

  private def sfDir = "/root/testdata/sf0.01"

  /** Writes `df` with the given layout, returns per-file min/max of
    * both keys.
    */
  private def fileStats(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("p_min"), max("l_partkey").as("p_max"),
        min("l_suppkey").as("s_min"), max("l_suppkey").as("s_max"))
  }

  test("z-order files prune on the SECOND dimension; linear sort cannot") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
    val tmp = System.getProperty("java.io.tmpdir")

    val b = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val z = ScaleQueries.morton2(
      ScaleQueries.normalize16(col("l_partkey"), lit(b.getLong(0)), lit(b.getLong(1))),
      ScaleQueries.normalize16(col("l_suppkey"), lit(b.getLong(2)), lit(b.getLong(3))))
    val zstats = fileStats(
      li.withColumn("z", z)
        .repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
        .drop("z"),
      s"$tmp/graft_zorder_spec_z")
    val lstats = fileStats(
      li.repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey")),
      s"$tmp/graft_zorder_spec_linear")

    // A slab predicate on the NON-leading dimension: suppkey ∈ [10, 19]
    // (10% of the 100-supplier space at sf0.01). A file can be skipped
    // iff its [s_min, s_max] misses the slab.
    def hits(stats: DataFrame): (Long, Long) = {
      val total = stats.count()
      val hit = stats
        .filter(col("s_max") >= 10 && col("s_min") <= 19).count()
      (hit, total)
    }
    val (zHit, zTotal) = hits(zstats)
    val (lHit, lTotal) = hits(lstats)

    assert(zTotal === 16 && lTotal === 16)
    // Linear-by-partkey layout: every file spans ~the full suppkey
    // range, so nothing is skippable.
    assert(lHit === lTotal, s"expected no pruning in linear layout, got $lHit/$lTotal")
    // Z-order: the slab intersects only the files whose quad-tree
    // cells overlap it — at most half the files, typically ~a quarter.
    assert(zHit <= zTotal / 2,
      s"z-order layout should prune ≥half the files, hit $zHit/$zTotal")
  }

  test("morton2 interleaves bits (spot values)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ScaleQueries.morton2(col("x"), col("y")).as("z"))
    // morton(3,5) = interleave(x=011, y=101) = y2 x2 y1 x1 y0 x0
    //             = 1 0 0 1 1 1 = 39; morton(1,0)=1; morton(0,1)=2;
    // morton(65535,65535) = 2^32 - 1.
    assert(df.as[Long].collect().toSeq === Seq(0L, 1L, 2L, 39L, 4294967295L))
  }
}
