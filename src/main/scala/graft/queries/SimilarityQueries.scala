package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Similarity search over `embeddings.embedding` (64-dim float
  * vectors): brute-force cosine top-k as the correctness baseline, and
  * a random-hyperplane LSH-bucketed variant as the 100 TB path.
  *
  * Both are fully oracle-checked: dot products accumulate
  * sequentially in double ([[Dedup.dot]] ≡ DuckDB `list_dot_product`
  * on DOUBLE lists, bit-identical), and the LSH hyperplanes are
  * md5-derived ±1 weights so the oracle reproduces the SAME candidate
  * sets — the oracle checks the algorithm, brute force checks the
  * ground truth.
  */
object SimilarityQueries {

  private val K = 10
  private val NQ = 5 // query vectors: vec_id < NQ

  /** Brute-force cosine top-k per query vector. One pass: queries are
    * tiny (broadcast), corpus streams; the per-query top-k is a
    * row_number window over (query, cosine desc, id) — at scale this
    * partial-aggregates per partition before the shuffle.
    */
  def topkBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.select(col("vec_id").as("q_id"), col("emb").as("emb_q"))
      .filter(col("q_id") < NQ)
    val cos = graft.functions.GraftFunctions.cosineSim(spark, col("emb_q"), col("emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cosine", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  private def cosSql(a: String, b: String) =
    s"list_dot_product($a.emb, $b.emb)/($a.nrm*$b.nrm)"

  private val topkBruteOracle =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |s AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, ${cosSql("q", "c")} AS cosine
       |  FROM n q JOIN n c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id),
       |r AS (
       |  SELECT q_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM s)
       |SELECT q_id, rank, vec_id, round(cosine, 6) AS cosine
       |FROM r WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  private val NHP = 16 // hyperplanes = signature bits

  /** Random-hyperplane signature: bit t = [emb · hp_t > 0], where
    * hp_t[d] = ±1 from md5("hp_t_d") parity — deterministic and
    * engine-portable. Cost: one sequential dot per (vector, plane).
    */
  private def rhSignature(emb: Column): Column = {
    val bits = (0 until NHP).map { t =>
      val signs = transform(sequence(lit(0), lit(63)),
        d => when(TextOps.h60(concat(lit(s"hp_${t}_"), d.cast("string"))) % 2 === 1, 1.0)
          .otherwise(-1.0))
      when(Dedup.dot(emb, signs) > 0, 1L << t).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN top-k: candidates = corpus vectors whose 16-bit
    * hyperplane signature is within hamming distance 4 of the query's
    * (multi-probe), exact-cosine-reranked to top-k. At 100 TB the
    * signature is the shuffle key (bucket join); here the oracle
    * reproduces the identical candidate sets, so the check validates
    * the ALGORITHM (brute-force top-k above validates quality).
    */
  def topkAnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("sig", rhSignature(col("emb")))
    val q = e.select(col("vec_id").as("q_id"), col("emb").as("emb_q"),
      col("sig").as("sig_q")).filter(col("q_id") < NQ)
    val cos = graft.functions.GraftFunctions.cosineSim(spark, col("emb_q"), col("emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    broadcast(q)
      .join(e, col("q_id") =!= col("vec_id") &&
        expr("bit_count(sig_q ^ sig)") <= 4)
      .withColumn("cosine", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val annOracle = {
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |hp AS (
       |  SELECT t, list_transform(generate_series(0, 63),
       |    d -> CASE WHEN (${TextOps.h60Sql("('hp_'||CAST(t AS VARCHAR)||'_'||CAST(d AS VARCHAR))")}) % 2 = 1
       |              THEN 1.0 ELSE -1.0 END) AS signs
       |  FROM generate_series(0, ${NHP - 1}) ht(t)),
       |sg AS (
       |  SELECT n.vec_id,
       |    CAST(sum(CASE WHEN list_dot_product(n.emb, hp.signs) > 0
       |                  THEN (CAST(1 AS BIGINT) << hp.t) ELSE 0 END) AS BIGINT) AS sig
       |  FROM n, hp GROUP BY n.vec_id),
       |v AS (SELECT n.vec_id, emb, nrm, sig FROM n JOIN sg ON n.vec_id = sg.vec_id),
       |s AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, ${cosSql("q", "c")} AS cosine
       |  FROM v q JOIN v c
       |    ON q.vec_id < $NQ AND q.vec_id <> c.vec_id
       |    AND bit_count(xor(q.sig, c.sig)) <= 4),
       |r AS (
       |  SELECT q_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM s)
       |SELECT q_id, rank, vec_id, round(cosine, 6) AS cosine
       |FROM r WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("sim_topk_brute", Some(topkBruteOracle), topkBrute),
    Q("sim_ann_lsh", Some(annOracle), topkAnnLsh),
  )
}
