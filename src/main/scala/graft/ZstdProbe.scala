package graft

import org.apache.spark.sql.SparkSession

/** Round-16 A/B of spark.io.compression.codec (lz4 default vs zstd,
  * guide §2.3) over the most shuffle-heavy headline queries. Codec is
  * per-SparkContext, so the A/B alternates SESSIONS (A,B,A,B) and
  * compares per-codec minima. Not part of any query path;
  * delete-safe.
  */
object ZstdProbe {
  val Queries = Seq("dedup_jaccard_pairs", "dedup_minhash_lsh",
    "sql_tpch_q18", "search_mmr")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def session(codec: String): SparkSession = {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.io.compression.codec", codec)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    val mins = collection.mutable.Map.empty[(String, String), Double]
    for (round <- 1 to 2; codec <- Seq("lz4", "zstd")) {
      val spark = session(codec)
      for (q <- Queries) {
        val fn = SparkEntry.queries(q)
        // warmup once per session
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        for (_ <- 1 to 3) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          val k = (q, codec)
          mins(k) = math.min(mins.getOrElse(k, Double.MaxValue), dt)
        }
      }
      System.err.println(s"[zstdprobe] round $round $codec done")
      spark.stop()
      // a fresh context next loop — clear the stopped session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    for (q <- Queries)
      System.err.println(f"[zstdprobe] $q%-24s lz4=${mins((q, "lz4"))}%.2f zstd=${mins((q, "zstd"))}%.2f")
  }
}
