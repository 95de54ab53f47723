package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Hybrid retrieval (round 7): the RAG serving face that combines the
  * engine's two retrieval primitives — BM25 lexical scoring
  * ([[TextQueries.bm25Scored]]) and embedding cosine search (the
  * `sim_*` family) — with reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009): `rrf(d) = Σ_legs 1/(60 + rank_leg(d))`.
  * RRF is the standard score-free fusion: it needs no cross-leg score
  * calibration (BM25 and cosine live on incomparable scales), which
  * is exactly why production hybrid search defaults to it.
  *
  * One query expressed in both modalities — lexically as the fixed
  * 3-term bag `text_bm25` scores, semantically as embedding 0
  * (`documents.doc_id` and `embeddings.vec_id` share an id space) —
  * retrieves top-[[NCAND]] per leg; the fused top-[[K]] is returned.
  *
  * 100 TB shape: each leg is corpus-scan + broadcast stats +
  * `TakeOrderedAndProject` (no wide shuffle; the full-corpus
  * `row_number` trap is avoided by ranking AFTER the distributed
  * top-NCAND, over frames bounded at NCAND rows by construction).
  * The fusion join touches 2×NCAND rows — driver-trivial at any
  * corpus size; candidate depth, not data volume, prices the fuse.
  */
object RetrievalQueries {

  private val K = 10 // fused results served
  private val NCAND = 50 // per-leg candidate depth
  private val RRF_K = 60 // the paper's k (rank damping)

  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    // ---- lexical leg: BM25 top-NCAND, then rank the bounded frame ----
    val lexTop = TextQueries.bm25Scored(spark, sfDir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(NCAND)
    val lex = lexTop
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    // ---- semantic leg: cosine top-NCAND for query vector 0 ----
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("doc_id") === 0).select(col("emb").as("emb_q"))
    val semTop = e.filter(col("doc_id") =!= 0) // self-exclusion, vector side only
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosineSim(spark, col("emb_q"), col("emb")))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(NCAND)
    val sem = semTop
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("cosine").desc, col("doc_id"))))
      .select(col("doc_id"), col("sem_rank"))
    // ---- reciprocal-rank fusion over the union of candidates ----
    // fixed addition order (lex + sem) ⇒ bit-identical doubles in the
    // oracle; docs surfaced by one leg only score with that leg alone
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(RRF_K) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RRF_K) + col("sem_rank")), lit(0.0)),
          6).as("rrf"),
        col("lex_rank"), col("sem_rank"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(K)
  }

  private val hybridOracle =
    s"""WITH ${TextQueries.bm25ScoredSql},
       |lextop AS (
       |  SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
       |  ORDER BY bm25 DESC, doc_id LIMIT $NCAND),
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
       |    AS lex_rank
       |  FROM lextop),
       |e AS (
       |  SELECT vec_id AS doc_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |n AS (SELECT doc_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |qv AS (SELECT emb, nrm FROM n WHERE doc_id = 0),
       |semtop AS (
       |  SELECT c.doc_id,
       |    list_dot_product(qv.emb, c.emb)/(qv.nrm*c.nrm) AS cosine
       |  FROM n c, qv WHERE c.doc_id <> 0
       |  ORDER BY cosine DESC, c.doc_id LIMIT $NCAND),
       |sem AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT)
       |    AS sem_rank
       |  FROM semtop)
       |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       |  round(COALESCE(CAST(1.0 AS DOUBLE)/($RRF_K + lex_rank), 0)
       |      + COALESCE(CAST(1.0 AS DOUBLE)/($RRF_K + sem_rank), 0), 6) AS rrf,
       |  lex_rank, sem_rank
       |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT $K""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("search_hybrid_rrf", Some(hybridOracle), hybridRrf),
  )
}
