package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence probe for the heaviest dedup operators.
  *
  * The 100 TB arguments in PLANS.md are made from plan shape (equi-join
  * blocking, bounded state, no driver collects); this main turns one of
  * them into a measured datapoint by running the slowest dedup family
  * members on sf0.1 (~5k docs) and on a DERIVED 10x corpus, and
  * printing the wall-clock ratio. Near-linear ratios (~10x on 32
  * threads) are the expected signature of the bucketed-equi-join
  * shapes; a quadratic shape would show ~100x.
  *
  * The 10x corpus is 10 replicas of the sf0.1 `documents` table with
  * (a) doc_ids offset per replica and (b) every word salted with the
  * replica tag (`w` -> `w_rK`). The salt keeps replica vocabularies
  * DISJOINT, so the near-dup pair structure of each replica equals the
  * original corpus (output exactly 10x, candidate blocks scale
  * linearly) — a clean throughput probe, not a pathological
  * all-duplicates blow-up. Derived data is written under /tmp, never
  * into the read-only testdata tree.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaledDir = "/tmp/graft_scale10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = base.agg(max(col("doc_id"))).head.getLong(0) + 1
    val scaled = (0 until 10).map { k =>
      base.withColumn("doc_id", col("doc_id") + lit(k * maxId))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_r$k"))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")
    val n0 = base.count(); val n1 = spark.read.parquet(s"$scaledDir/documents.parquet").count()
    System.err.println(s"[probe] corpus: $n0 docs -> $n1 docs")

    val targets: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "dedup_jaccard_pairs", "dedup_simhash", "dedup_clusters",
      "dedup_minhash_lsh").map(n => n -> SparkEntry.queries(n))

    targets.foreach { case (name, fn) =>
      def run(dir: String): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (warm, _) = run(sfDir) // absorb codegen/JIT once per query
      val (t1, r1) = run(sfDir)
      val (t10, r10) = run(scaledDir)
      System.err.println(
        f"[probe] $name%-22s sf0.1: $t1%7.2fs ($r1 rows, warmup=$warm%.2fs)  10x: $t10%7.2fs ($r10 rows)  ratio=${t10 / t1}%.1fx  rows_ratio=${r10.toDouble / r1}%.1fx")
    }
    spark.stop()
  }
}
