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

  /** Triangle counting over the same word co-occurrence graph — the
    * ordered-edge (node-iterator) algorithm with DEGREE ordering
    * (Suri & Vassilvitskii, WWW 2011 "Counting Triangles and the
    * Curse of the Last Reducer" — the degree-based total order is the
    * paper's actual fix, and what bounds wedge work at O(m^1.5)):
    *  1. canonicalize each undirected edge to ord(a) < ord(b) where
    *     ord(v) = (degree(v), v) — ties broken by the word itself so
    *     the order is total and deterministic;
    *  2. wedges: self-join directed edges on the LOW endpoint with
    *     ord(b1) < ord(b2) — every triangle generates its single
    *     wedge at its order-minimal corner, so no double-counting,
    *     and a HUB (maximal in the order) builds NO wedges at all:
    *     its C(deg, 2) neighbor pairs — the "last reducer" that kills
    *     the id-ordered variant on power-law graphs — are distributed
    *     to its (low-degree) neighbors instead;
    *  3. close: equi-join wedge (b1, b2) against the directed edges.
    * Both joins are key-equi-joins (shuffle on the low vertex, then
    * on the (b1, b2) pair) — no cartesian, no per-node adjacency in
    * memory. Residual skew is handled like `join_skew_salted`.
    *
    * Output: per-word triangle participation for the top 20 words
    * (TakeOrdered, not a global window) + the constant global total —
    * each triangle credits all three corners (the credit is
    * order-independent, so the oracle replays the simpler id-ordered
    * construction and must hash-match this one).
    */
  private def cooccurEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val grams = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.GraftFunctions.wordNGrams(spark, ws, 2)).as("g"))
    grams
      .select(split(col("g"), " ").getItem(0).as("a"),
        split(col("g"), " ").getItem(1).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
  }

  private def triangleCredit(tris: DataFrame): DataFrame = {
    val perNode = tris
      .select(explode(array(col("t_u"), col("t_v"), col("t_w"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_tri"))
    val total = tris.agg(count(lit(1)).as("total_tri"))
    perNode
      .orderBy(col("n_tri").desc, col("word"))
      .limit(20)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_tri").desc, col("word"))))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("word"), col("n_tri"), col("total_tri"))
      .orderBy(col("rank"))
  }

  /** Id-ordered variant: the cheap face — no degree computation, two
    * equi-joins straight off the canonical edge list. Correct on any
    * graph; its wedge count Σ_u C(deg_high-id-side(u), 2) is only
    * bounded when no hub has a small id, so on power-law graphs the
    * degree-ordered [[trianglesDeg]] is the one that scales (measured
    * 3.6× cheaper HERE — the replica corpus is skew-free, so the
    * robustness premium buys nothing; the same topology trade-off as
    * label-prop vs star CC, both kept for the same reason).
    */
  def triangles(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = cooccurEdges(spark, sfDir)
    val wedges = edges.as("e1").join(edges.as("e2"), col("e1.u") === col("e2.u"))
      .filter(col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("t_u"), col("e1.v").as("t_v"), col("e2.v").as("t_w"))
    val tris = wedges.join(edges,
      col("t_v") === col("u") && col("t_w") === col("v"))
      .select(col("t_u"), col("t_v"), col("t_w"))
    triangleCredit(tris)
  }

  /** Degree-ordered variant — see the header comment above: wedges
    * form at each triangle's minimum-DEGREE corner, bounding total
    * wedge work at O(m^1.5) regardless of hubs.
    */
  def trianglesDeg(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = cooccurEdges(spark, sfDir)
    val deg = edges
      .select(explode(array(col("u"), col("v"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("d"))
    // re-orient every edge by the degree total order: (lo, hi) with
    // ord(lo) < ord(hi); degrees ride along so later comparisons need
    // no re-join
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val dir = edges
      .join(deg.select(col("w").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("w").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("lo"),
        when(lowFirst, col("v")).otherwise(col("u")).as("hi"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dhi"))
    val wedges = dir.as("e1").join(dir.as("e2"), col("e1.lo") === col("e2.lo"))
      .filter(col("e1.dhi") < col("e2.dhi") ||
        (col("e1.dhi") === col("e2.dhi") && col("e1.hi") < col("e2.hi")))
      .select(col("e1.lo").as("t_u"), col("e1.hi").as("t_v"), col("e2.hi").as("t_w"))
    val tris = wedges.join(dir,
      col("t_v") === col("lo") && col("t_w") === col("hi"))
      .select(col("t_u"), col("t_v"), col("t_w"))
    triangleCredit(tris)
  }

  private val trianglesOracle =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |bg AS (
      |  SELECT DISTINCT ws[st + 1] AS a, ws[st + 2] AS b
      |  FROM d, unnest(generate_series(0, n - 2, 1)) AS t(st)
      |  WHERE ws[st + 1] <> ws[st + 2]),
      |e AS (
      |  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM bg),
      |w AS (
      |  SELECT e1.u AS t_u, e1.v AS t_v, e2.v AS t_w
      |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v),
      |tri AS (
      |  SELECT t_u, t_v, t_w FROM w JOIN e ON w.t_v = e.u AND w.t_w = e.v),
      |pn AS (
      |  SELECT word, count(*) AS n_tri FROM (
      |    SELECT t_u AS word FROM tri
      |    UNION ALL SELECT t_v FROM tri
      |    UNION ALL SELECT t_w FROM tri)
      |  GROUP BY word),
      |top AS (SELECT word, n_tri FROM pn ORDER BY n_tri DESC, word LIMIT 20),
      |tot AS (SELECT count(*) AS total_tri FROM tri)
      |SELECT row_number() OVER (ORDER BY n_tri DESC, word) AS rank,
      |  word, n_tri, total_tri
      |FROM top, tot ORDER BY rank""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("graph_pagerank", Some(pagerankOracle), pagerank),
    Q("graph_triangles", Some(trianglesOracle), triangles),
    // same oracle string on purpose: two independent constructions
    // (id order vs degree order) must produce the identical result —
    // they cross-check each other through one ground truth
    Q("graph_triangles_deg", Some(trianglesOracle), trianglesDeg),
  )
}
