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

    // 10x embeddings: replica k gets a SIGNED PERMUTATION of the
    // dimensions (cyclic shift by 7k — coprime to 64, so all 10 shifts
    // are distinct — plus a replica-dependent sign pattern). A signed
    // permutation is orthogonal: intra-replica dot products (and so
    // every cosine the dedup/ANN queries compute) are preserved
    // EXACTLY, while cross-replica cosines decorrelate to ~0 on this
    // near-orthogonal corpus — each replica reproduces the original
    // similarity structure without cross-replica duplicate blow-up.
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxVid = embBase.agg(max(col("vec_id"))).head.getLong(0) + 1
    val embScaled = (0 until 10).map { k =>
      val shift = (7 * k) % 64
      // sign pattern is GENUINELY replica-dependent: bit (k % 6) of the
      // dimension index flips sign, so replicas 0..5 flip on different
      // index bits (the round-5 form (i*31 + k*17) % 2 reduced to
      // (i+k) % 2 — only two distinct patterns; the distinct cyclic
      // shifts were doing all the decorrelation work)
      embBase.withColumn("vec_id", col("vec_id") + lit(k * maxVid))
        .withColumn("embedding", expr(
          s"""transform(sequence(0, 63), i ->
             |  CAST(CASE WHEN (shiftright(i, ${k % 6}) + $k) % 2 = 0
             |            THEN 1.0 ELSE -1.0 END
             |       * element_at(embedding, ((i + $shift) % 64) + 1) AS FLOAT))"""
            .stripMargin))
    }.reduce(_ unionByName _)
    embScaled.write.mode("overwrite").parquet(s"$scaledDir/embeddings.parquet")
    System.err.println(s"[probe] embeddings: $maxVid vecs -> ${maxVid * 10} vecs")

    val targets: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "dedup_jaccard_pairs", "dedup_simhash", "dedup_clusters",
      "dedup_clusters_star", "dedup_minhash_lsh",
      // embedding family (round 5) + DSIR over the salted documents
      "dedup_embedding_cosine", "dedup_semantic", "sim_ann_pq",
      "sim_ann_ivfpq", "dsir_select").map(n => n -> SparkEntry.queries(n))

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
