package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.ScaleQueries

/** File-level invariants of the `backfill_partition` lifecycle — the
  * part the content hash gate can't see: a backfill must repair its
  * target partition WITHOUT rewriting any other (at 100 TB, rewriting
  * untouched partitions is the difference between "re-run yesterday"
  * and "rebuild the table", and silently invalidates downstream
  * caches/replication keyed on file identity).
  */
class BackfillSpec extends SparkSpec {

  private def listing(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath.stripPrefix(root) -> f.length()).toMap
  }

  test("backfill rewrites only the poisoned partition; others byte-stable") {
    val path = Files.createTempDirectory("graft_backfill_spec").toString
    val bad = s"month=${ScaleQueries.BackfillBadMonth}"

    // run the lifecycle but pause between steps by re-driving them:
    // step 1 (good table)
    def monthly(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    val src = graft.sources.Tables.orders(spark, sf)
    monthly(src).write.mode("overwrite").partitionBy("month").parquet(path)
    val good = listing(path)
    val goodRows = spark.read.parquet(path).count()
    assert(good.keys.exists(_.startsWith(s"/$bad/")),
      s"poison month absent from the sink: ${good.keys.take(3)}")

    // step 2: poisoned rerun (half the month's rows), dynamic overwrite
    val isBad = date_format(col("o_orderdate"), "yyyy-MM") ===
      ScaleQueries.BackfillBadMonth
    monthly(src.filter(isBad).filter(col("o_orderkey") % 2 === 0))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("month").parquet(path)
    assert(spark.read.parquet(path).count() < goodRows,
      "poisoning did not lose rows — the repair would prove nothing")
    val poisoned = listing(path)
    assert(poisoned.view.filterKeys(!_.startsWith(s"/$bad/")).toMap ==
      good.view.filterKeys(!_.startsWith(s"/$bad/")).toMap,
      "dynamic overwrite touched partitions outside the poison month")

    // step 3: backfill the month; every other partition's files must
    // be IDENTICAL (path + length), and content must equal a full
    // recompute
    monthly(src.filter(isBad))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("month").parquet(path)
    val repaired = listing(path)
    assert(repaired.view.filterKeys(!_.startsWith(s"/$bad/")).toMap ==
      good.view.filterKeys(!_.startsWith(s"/$bad/")).toMap,
      "backfill rewrote untouched partitions")
    assert(spark.read.parquet(path).count() == goodRows)
    val want = monthly(src).groupBy("month").count()
      .collect().map(_.toString).sorted
    val got = spark.read.parquet(path).groupBy("month").count()
      .collect().map(_.toString).sorted
    assert(got.sameElements(want), "repaired table != full recompute")
  }

  test("backfill is idempotent: a second identical run is a no-op on content") {
    val path = Files.createTempDirectory("graft_backfill_idem").toString
    ScaleQueries.backfillLifecycle(spark, sf, path)
    val once = spark.read.parquet(path).collect().map(_.toString).sorted
    // re-running the WHOLE lifecycle (the scheduler's at-least-once
    // world) converges to the same table
    ScaleQueries.backfillLifecycle(spark, sf, path)
    val twice = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(once.sameElements(twice))
  }
}
