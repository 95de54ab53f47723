package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Nearest-centroid assignment WITHOUT the embedding column:
    * (vec_id, c_id, c_cos) where c_id is the argmax-cosine centroid
    * (ties → lowest c_id — the repo-wide quantizer contract).
    *
    * This is the scale-critical form. The round-5 implementations
    * ranked the corpus×centroids cross join with
    * `row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC)`,
    * which shuffles and SORTS all n×NC rows — each still carrying the
    * 64-double embedding. The 100× scale probe measured that directly:
    * 39.6 GB of memory spill in `dedup_semantic`'s assignment at 500k
    * vecs × 160 cells. Here the argmax is a `max_by` hash aggregate
    * over rows that carry only (vec_id, c_id, c_cos) — ~24 bytes, the
    * embedding never enters the aggregate — so map-side partial
    * aggregation reduces n×NC rows to n BEFORE the shuffle, and even
    * the sort-based fallback path sorts slim rows. The ordering key
    * `struct(c_cos, -c_id)` is unique per group (c_id is unique), so
    * the pick is deterministic and identical to the window form:
    * lexicographic max = highest c_cos, then lowest c_id.
    */
  def assignNearestSlim(spark: SparkSession, vecs: DataFrame,
      cent: DataFrame): DataFrame = {
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

  /** [[assignNearestSlim]] with the embedding re-attached:
    * (vec_id, emb, c_id, c_cos). The join back to `vecs` is one
    * LINEAR n-row shuffle — NC× lighter than sorting the n×NC
    * cross-join rows with embeddings aboard, which is what the
    * window form costs.
    */
  def assignNearest(spark: SparkSession, vecs: DataFrame,
      cent: DataFrame): DataFrame =
    vecs.join(assignNearestSlim(spark, vecs, cent), Seq("vec_id"))
      .select(col("vec_id"), col("emb"), col("c_id"), col("c_cos"))

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
