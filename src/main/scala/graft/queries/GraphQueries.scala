package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** Iterative graph analytics on DataFrames — the driver-side loop +
  * per-iteration join/aggregate pattern (GraphX's Pregel without the
  * RDD API; same shape Delta/GraphFrames users run today).
  *
  * [[pagerank]] runs 5 synchronous PageRank iterations over the word
  * co-occurrence graph of `documents` (nodes = words, edges = distinct
  * adjacent-word pairs, both directions). Scale shape: edges build
  * once from one corpus pass (native n-gram kernel), are REPARTITIONED
  * ON src AND PERSISTED, and the per-iteration work is one equi-join
  * (ranks ⋈ edges) + one aggregation on dst — at 100 TB only the small
  * rank table (one row per node) shuffles each iteration while the big
  * edge table keeps its cached partitioning; no side is hint-broadcast
  * (AQE may still elect a broadcast when the ranks side measures
  * small, which is the right call exactly when it is cheap). Iteration
  * count is fixed (5) so lineage stays bounded without checkpointing
  * (the clusters query shows the checkpointed variant;
  * [[pagerankConverged]] the delta-driven early-exit variant).
  *
  * Cross-engine float determinism (same discipline as `text_lm_score`):
  * each per-edge contribution rank/outdeg is computed in double
  * (identical IEEE tree both engines) then QUANTIZED to
  * DECIMAL(20,12); the per-node sum is an exact decimal aggregation
  * (order-free); the damping update re-quantizes. Five iterations of
  * bit-identical updates hash-match the DuckDB oracle's unrolled CTE
  * chain.
  */
object GraphQueries {
  private val D = "decimal(20,12)"

  def pagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val grams = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.GraftFunctions.wordNGrams(spark, ws, 2)).as("g"))
    val pairs = grams
      .select(split(col("g"), " ").getItem(0).as("a"),
        split(col("g"), " ").getItem(1).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val edges = pairs
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .select(col("a").as("src"), col("b").as("dst"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // partition the (large) edge side by the join key ONCE; every
    // iteration's join then reuses the cached layout and only the
    // per-node rank table moves
    val edgesDeg = edges.join(deg, "src").repartition(col("src")).persist()
    val nn = deg.agg(count(lit(1)).as("n")).persist()

    val rank0 = deg.crossJoin(broadcast(nn))
      .select(col("src").as("word"), (lit(1.0) / col("n")).cast(D).as("rank"))

    val rank5 = (1 to 5).foldLeft(rank0) { (ranks, _) =>
      ranks.join(edgesDeg, ranks("word") === edgesDeg("src"))
        .select(col("dst"),
          (col("rank").cast("double") / col("outdeg")).cast(D).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .crossJoin(broadcast(nn))
        .select(col("dst").as("word"),
          (lit(0.15) / col("n") + lit(0.85) * col("s").cast("double")).cast(D).as("rank"))
    }
    rank5
      .select(col("word"), round(col("rank").cast("double"), 6).as("pagerank"))
      .orderBy(col("word"))
  }

  /** Delta-driven PageRank over an arbitrary `(src, dst)` edge list:
    * the same quantized update rule as [[pagerank]], iterating until
    * the L1 rank delta (Σ|r_i − r_{i−1}|) drops below `tol` or
    * `maxIter` is hit — the bounded-convergence form of the Pregel
    * loop (GraphX's `runUntilConvergence` does the same driver-side
    * check). The delta is ONE extra 1-row aggregate per iteration
    * fetched driver-side; `localCheckpoint` each iteration bounds the
    * lineage an unbounded iteration count would otherwise grow
    * (the fixed-5 [[pagerank]] doesn't need it). Returns the final
    * ranks and the number of iterations actually run.
    */
  def pagerankConverged(
      edges: DataFrame, tol: Double, maxIter: Int): (DataFrame, Int) = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = edges.join(deg, "src").repartition(col("src")).persist()
    val nn = deg.agg(count(lit(1)).as("n")).persist()
    var ranks = deg.crossJoin(broadcast(nn))
      .select(col("src").as("word"), (lit(1.0) / col("n")).cast(D).as("rank"))
      .localCheckpoint()
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta >= tol) {
      val next = ranks.join(edgesDeg, ranks("word") === edgesDeg("src"))
        .select(col("dst"),
          (col("rank").cast("double") / col("outdeg")).cast(D).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .crossJoin(broadcast(nn))
        .select(col("dst").as("word"),
          (lit(0.15) / col("n") + lit(0.85) * col("s").cast("double")).cast(D).as("rank"))
        .localCheckpoint()
      delta = next.as("a")
        .join(ranks.as("b"), col("a.word") === col("b.word"), "full_outer")
        .agg(sum(abs(
          coalesce(col("a.rank"), lit(0).cast(D)).cast("double") -
            coalesce(col("b.rank"), lit(0).cast(D)).cast("double"))).as("d"))
        .head.getDouble(0)
      ranks.unpersist()
      ranks = next
      it += 1
    }
    edgesDeg.unpersist(); nn.unpersist()
    (ranks, it)
  }

  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT e.dst AS word,
       |    CAST(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
       |      + CAST(0.85 AS DOUBLE) * CAST(sum(CAST(CAST($prev.rank AS DOUBLE) / deg.outdeg
       |                             AS DECIMAL(20,12))) AS DOUBLE)
       |      AS DECIMAL(20,12)) AS rank
       |  FROM $prev JOIN e ON $prev.word = e.src JOIN deg ON deg.src = $prev.word
       |  GROUP BY e.dst)""".stripMargin

  private val pagerankOracle = {
    val iters = (1 to 5)
      .map(i => iterSql(if (i == 1) "r0" else s"r${i - 1}", s"r$i"))
      .mkString(",\n")
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents),
       |bg AS (
       |  SELECT DISTINCT ws[st + 1] AS a, ws[st + 2] AS b
       |  FROM d, unnest(generate_series(0, n - 2, 1)) AS t(st)
       |  WHERE ws[st + 1] <> ws[st + 2]),
       |e AS (SELECT a AS src, b AS dst FROM bg UNION SELECT b, a FROM bg),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (
       |  SELECT src AS word,
       |    CAST(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS DECIMAL(20,12)) AS rank
       |  FROM deg),
       |$iters
       |SELECT word, round(CAST(rank AS DOUBLE), 6) AS pagerank
       |FROM r5 ORDER BY word""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("graph_pagerank", Some(pagerankOracle), pagerank),
  )
}
