package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** The part of compaction SQL can't gate: the file-count/size
  * envelope. Content invariance is the `compact_files` oracle's job.
  */
class CompactionSpec extends SparkSpec {

  private def fileStats(dir: String): Map[String, Seq[Long]] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("o_orderpriority="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).toSeq)
      .toMap

  test("compaction collapses a fragmented sink to one file per partition") {
    val frag = Files.createTempDirectory("graft_cpt_frag").toString
    val out = Files.createTempDirectory("graft_cpt_out").toString
    val src = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    src.repartition(16)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(frag)
    val before = fileStats(frag)
    assert(before.values.map(_.size).sum > 20,
      s"fixture not fragmented enough: $before")
    // generous target ⇒ one bin per partition ⇒ exactly one file each
    val compacted = Compaction.compact(spark, frag, out,
      "o_orderpriority", targetBytes = 64 * 1024 * 1024)
    val after = fileStats(out)
    assert(after.keySet == before.keySet, "partition set changed")
    after.foreach { case (p, sizes) =>
      assert(sizes.size == 1, s"$p: expected 1 file, got ${sizes.size}")
    }
    // row-level content invariance (the oracle checks aggregates; this
    // checks every row survives byte-identically)
    val a = src.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val b = compacted.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderpriority")).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(a == b, "compaction changed row content")
  }

  test("bin count tracks partition bytes; collisions only merge") {
    val frag = Files.createTempDirectory("graft_cpt2_frag").toString
    val out = Files.createTempDirectory("graft_cpt2_out").toString
    graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .repartition(16)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(frag)
    val stats = Compaction.listPartitions(spark, frag, "o_orderpriority")
    val target = 16 * 1024L // small target to force multiple bins
    Compaction.compact(spark, frag, out, "o_orderpriority", target)
    val after = fileStats(out)
    stats.foreach { s =>
      val wantBins = math.max(1L, (s.bytes + target - 1) / target)
      val got = after(s"o_orderpriority=${s.value}").size
      assert(got >= 1 && got <= wantBins,
        s"${s.value}: ${s.bytes}B at target $target ⇒ ≤$wantBins files, got $got")
    }
  }

  test("compacts long-partitioned state layouts (Scd2Log/AnnIndex shape)") {
    // a micro-batch producer appending per-batch slivers to a
    // bucket=<long> layout — the streaming state dirs Scd2Log and
    // AnnIndex maintain; compaction is their table-service pair
    val frag = Files.createTempDirectory("graft_cpt3_frag").toString
    val out = Files.createTempDirectory("graft_cpt3_out").toString
    val src = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        pmod(col("o_custkey"), lit(4)).cast("long").as("bucket"))
    (0 until 5).foreach { _ => // five "micro-batches" of appends
      src.repartition(4)
        .write.mode("append").partitionBy("bucket").parquet(frag)
    }
    val before = Compaction.listPartitions(spark, frag, "bucket")
    assert(before.map(_.files).sum >= 20, s"fixture not fragmented: $before")
    val compacted = Compaction.compact(spark, frag, out, "bucket",
      targetBytes = 64 * 1024 * 1024)
    val after = Compaction.listPartitions(spark, out, "bucket")
    assert(after.map(_.value).toSet == before.map(_.value).toSet)
    assert(after.forall(_.files == 1), s"expected 1 file per bucket: $after")
    // content invariance incl. the long partition column's values
    val a = spark.read.parquet(frag).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val b = compacted.select(col("o_orderkey"), col("o_totalprice"), col("bucket"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(a == b, "compaction changed row content or bucket values")
  }
}
