package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coarse-quantizer TRAINING for the ANN / SemDeDup family: Lloyd's
  * k-means iterations composed from the `emb_centroids` update step
  * (`graft.queries.PipelineQueries.embCentroids` is the single-step
  * exhibit; this runs it to a usable codebook). Round 5 shipped the
  * IVF/SemDeDup query paths with a deterministic first-N-ids seed and
  * a "swap in a trained set upstream" note — this closes that loop:
  * `dedup_semantic` and the `sim_ann_ivf*` queries now run from
  * centroids trained in-engine, and their DuckDB oracles replay the
  * same training (see [[trainedCentroidsSql]]), so the trained
  * assignment is hash-gated end to end.
  *
  * Exact-arithmetic discipline (the `emb_centroids` pattern): each
  * mean component quantizes members to `floor(v·1000)` longs, sums
  * exactly, and divides ONCE as `CAST(sum AS DOUBLE)/(n·1000.0)` —
  * identical IEEE operands and operations in both engines, so the
  * trained centroids (and every cosine computed against them) are
  * bit-identical. Assignment ties break on (cos DESC, c_id), the same
  * contract as every other quantizer in the repo.
  *
  * 100 TB shape per iteration: centroids are ≤nCent rows (broadcast);
  * assignment is one corpus pass through [[assignNearest]] (see its
  * doc for why it aggregates instead of windowing); the mean update
  * is one (cell, dim) hash-aggregate. Each iteration localCheckpoints
  * the tiny centroid table so k iterations don't stack k
  * analysis-heavy plans (the `quality_classifier` lineage pattern).
  */
object Quantizer {

  /** Largest codebook the assignment will inline as plan literals.
    * Every quantizer in the repo is ≤16 cells; the bound exists so an
    * unexpectedly large centroid table falls back to the distributed
    * crossJoin+max_by form instead of building a megabyte expression
    * tree (and so the collect below stays metadata-scale by
    * construction).
    */
  private val MaxInlineCentroids = 1024

  /** Pull the (tiny, ≤[[MaxInlineCentroids]]-row) codebook to the
    * driver, c_id-sorted. Same metadata-scale collect class as the ANN
    * probe lists: a coarse quantizer is O(cells) rows by design.
    */
  private def centRows(cent: DataFrame): Array[(Long, Seq[Double])] =
    cent.select(col("c_id").cast("long"), col("c_emb"))
      .limit(MaxInlineCentroids + 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** `struct(c_id, c_cos)` of the argmax-cosine centroid (ties →
    * lowest c_id — the repo-wide quantizer contract), as ONE native
    * codegen'd expression ([[graft.functions.NearestCentroid]]) with
    * the codebook riding along as a constant — a tight primitive loop
    * per row, bit-identical to the former crossJoin-of-cosineSim
    * arithmetic (see the expression's doc for why a composition of
    * built-in struct/array_max expressions was measurably WORSE).
    */
  private def bestCentroidExpr(spark: SparkSession,
      cs: Array[(Long, Seq[Double])], emb: Column): Column =
    org.apache.spark.sql.GraftPlanApi.column(
      graft.functions.NearestCentroid(
        org.apache.spark.sql.GraftPlanApi.expression(emb),
        cs.map(_._1), cs.map(_._2.toArray)))

  /** Nearest-centroid assignment WITHOUT the embedding column:
    * (vec_id, c_id, c_cos) where c_id is the argmax-cosine centroid
    * (ties → lowest c_id — the repo-wide quantizer contract).
    *
    * Round-15 shape: the codebook is ≤NC rows by design, so the
    * assignment is a NARROW per-row expression — the codegen'd
    * [[graft.functions.NearestCentroid]] with the collected codebook
    * carried as a constant reference object (the way a production ANN
    * build ships its codebook to workers); the argmax-cosine runs as
    * a tight primitive loop per row inside whole-stage codegen. Zero
    * joins, zero aggregates, zero shuffles. (An `array_max` over
    * `struct(c_cos, -c_id)` composition of built-ins was measured
    * SLOWER than the aggregate it replaced and abandoned — see the
    * NearestCentroid doc.)
    *
    * History (both prior shapes are strictly dominated): round 5
    * ranked the corpus×centroids cross join with a window — shuffling
    * and SORTING n×NC embedding-bearing rows, measured 39.6 GB of
    * spill at the 100× probe; round 6 replaced it with a slim max_by
    * aggregate (n×NC slim rows, map-side partials) + an n-row
    * join-back for callers that need the embedding. The expression
    * form removes the remaining aggregate exchange AND the join-back
    * entirely; an over-sized codebook (>[[MaxInlineCentroids]]) falls
    * back to the round-6 aggregate form.
    */
  def assignNearestSlim(spark: SparkSession, vecs: DataFrame,
      cent: DataFrame): DataFrame = {
    val cs = centRows(cent)
    if (cs.isEmpty) // empty codebook assigns nothing (old crossJoin shape)
      vecs.filter(lit(false))
        .select(col("vec_id"), lit(0L).as("c_id"), lit(0.0).as("c_cos"))
    else if (cs.length > MaxInlineCentroids)
      assignNearestSlimAgg(spark, vecs, cent)
    else {
      val best = bestCentroidExpr(spark, cs, col("emb"))
      vecs.select(col("vec_id"), best.getField("c_id").as("c_id"),
        best.getField("c_cos").as("c_cos"))
    }
  }

  /** The round-6 distributed fallback (crossJoin + slim max_by): kept
    * for codebooks too large to inline as literals.
    */
  private[graft] def assignNearestSlimAgg(spark: SparkSession,
      vecs: DataFrame, cent: DataFrame): DataFrame = {
    val ccos = graft.functions.GraftFunctions
      .cosineSim(spark, col("emb"), col("c_emb"))
    vecs.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("c_id"), ccos.as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("c_id"), col("c_cos")),
        struct(col("c_cos"), (-col("c_id")).as("neg_id"))).as("best"))
      .select(col("vec_id"), col("best.c_id").as("c_id"),
        col("best.c_cos").as("c_cos"))
  }

  /** [[assignNearestSlim]] with the embedding kept aboard:
    * (vec_id, emb, c_id, c_cos). With the expression-form assignment
    * this is a pure projection — the round-6 n-row join-back shuffle
    * is gone (the fallback path joins back as before).
    */
  def assignNearest(spark: SparkSession, vecs: DataFrame,
      cent: DataFrame): DataFrame = {
    val cs = centRows(cent)
    if (cs.isEmpty) // empty codebook assigns nothing (old crossJoin shape)
      vecs.filter(lit(false)).select(col("vec_id"), col("emb"),
        lit(0L).as("c_id"), lit(0.0).as("c_cos"))
    else if (cs.length > MaxInlineCentroids)
      vecs.join(assignNearestSlimAgg(spark, vecs, cent), Seq("vec_id"))
        .select(col("vec_id"), col("emb"), col("c_id"), col("c_cos"))
    else {
      val best = bestCentroidExpr(spark, cs, col("emb"))
      vecs.select(col("vec_id"), col("emb"), best.getField("c_id").as("c_id"),
        best.getField("c_cos").as("c_cos"))
    }
  }

  /** k-means iterations used by the trained-quantizer query paths.
    * Two is enough to move every centroid off its seed (spec-checked)
    * while keeping the unrolled oracle SQL readable; production would
    * run to assignment fixpoint with the same per-iteration shape.
    */
  val TrainIters = 2

  private val QuantScale = 1000 // member quantum 1e-3 (emb_centroids)

  /** Train `nCent` centroids over `vecs` (columns `vec_id: long`,
    * `emb: array<double>`, fixed `dims` width): seed = the first
    * `nCent` vec_ids, then `iters` Lloyd steps. Cells that lose all
    * members keep their previous centroid (deterministic, mirrored in
    * SQL). Returns (c_id, c_emb) — c_id keeps the seed's id space.
    */
  def trainedCentroids(spark: SparkSession, vecs: DataFrame, nCent: Int,
      iters: Int = TrainIters, dims: Int = 64): DataFrame = {
    var cent = vecs.filter(col("vec_id") < nCent)
      .select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = assignNearest(spark, vecs, cent)
        .select(col("vec_id"), col("emb"), col("c_id"))
      // The posexplode + two-level aggregate STAYS (round-16 measured
      // dead end): fusing the means into one groupBy(c_id) with `dims`
      // sum(element_at(emb, d)) expressions — one exchange, no explode
      // — measured FLAT at dims=64/NC=1024 (interleaved A/B min 2.02
      // vs 2.04 s) and 1.7× SLOWER at dims=128/NC=16 (0.78 vs 1.35 s
      // min-of-7): past ~100 output fields the wide aggregate falls
      // out of whole-stage codegen (spark.sql.codegen.maxFields),
      // while the exploded form keeps every operator narrow and fused.
      // The (c_id, pos) partials map-side-combine to ≤NC·dims rows per
      // map partition, so the explode never reaches the exchange.
      val means = assigned
        .select(col("c_id"), posexplode(col("emb")).as(Seq("pos", "v")))
        .select(col("c_id"), col("pos"),
          floor(col("v") * QuantScale).cast("long").as("q"))
        .groupBy(col("c_id"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
        .withColumn("cv",
          col("sq").cast("double") / (col("n") * lit(QuantScale.toDouble)))
        .groupBy(col("c_id"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("cv")))),
          s => s.getField("cv")).as("new_emb"))
      cent = cent.join(means, Seq("c_id"), "left")
        .select(col("c_id"),
          coalesce(col("new_emb"), col("c_emb")).as("c_emb"))
        .localCheckpoint()
    }
    cent
  }

  /** The DuckDB replay of [[trainedCentroids]], as a CTE-chain
    * fragment. Assumes an upstream CTE `n(vec_id, emb, nrm)` (the
    * standard normalized-embeddings prelude every ANN oracle already
    * defines). Emits CTEs `cent0, a1, m1, arr1, cent1, …` and a final
    * `cent(c_id, c_emb, c_nrm)` — the exact shape the round-5 oracles
    * bound to their seed CTE, so downstream oracle SQL is unchanged.
    * Embed via `s",\n${Quantizer.trainedCentroidsSql(nc)}"` after the
    * `n` CTE.
    */
  def trainedCentroidsSql(nCent: Int, iters: Int = TrainIters,
      dims: Int = 64): String = {
    val head =
      s"cent0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM n WHERE vec_id < $nCent)"
    val steps = (1 to iters).map { i =>
      val p = s"cent${i - 1}"
      s"""a$i AS (
         |  SELECT vec_id, emb, c_id FROM (
         |    SELECT n.vec_id, n.emb, c.c_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY list_dot_product(n.emb, c.c_emb)
         |          /(n.nrm*sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC, c.c_id) AS rk
         |    FROM n, $p c) WHERE rk = 1),
         |m$i AS (
         |  SELECT c_id, d.dim, count(*) AS cnt,
         |    CAST(sum(CAST(floor(emb[d.dim] * 1000) AS BIGINT)) AS BIGINT) AS sq
         |  FROM a$i, generate_series(1, $dims) d(dim) GROUP BY c_id, d.dim),
         |arr$i AS (
         |  SELECT c_id, list(CAST(sq AS DOUBLE)/(cnt*1000.0) ORDER BY dim) AS c_emb
         |  FROM m$i GROUP BY c_id),
         |cent$i AS (
         |  SELECT p.c_id, COALESCE(arr$i.c_emb, p.c_emb) AS c_emb
         |  FROM $p p LEFT JOIN arr$i ON p.c_id = arr$i.c_id)""".stripMargin
    }
    val fin =
      s"""cent AS (
         |  SELECT c_id, c_emb, sqrt(list_dot_product(c_emb, c_emb)) AS c_nrm
         |  FROM cent$iters)""".stripMargin
    (head +: steps :+ fin).mkString(",\n")
  }
}
