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

  // ---------------------------------------------------------------- MMR

  private val MMR_NQ = 5 // query vectors (vec_ids 0..4)
  private val MMR_NCAND = 20 // per-query candidate pool depth
  private val MMR_K = 5 // diversified results served per query
  private val MMR_LAM = 0.7 // relevance weight
  // NOT computed as 1-MMR_LAM: 1.0-0.7 == 0.30000000000000004 in IEEE
  // doubles, while the oracle's literal 0.3 is a different bit pattern —
  // both engines must multiply by the SAME constant.
  private val MMR_MU = 0.3 // diversity weight

  /** Maximal-marginal-relevance diversified top-k (Carbonell &
    * Goldstein, SIGIR 1998): per query vector, greedily select K
    * results maximizing `λ·sim(d,q) − μ·max_{s∈selected} sim(d,s)` —
    * the serving-side answer to "the top-k are 10 near-duplicates of
    * each other". Complements [[hybridRrf]] (fusion) with
    * diversification, the other standard post-retrieval rerank.
    *
    * Shape: the greedy loop is inherently sequential in K, so it runs
    * as K Catalyst steps over frames BOUNDED BY CONSTRUCTION at
    * NQ×NCAND rows — never the corpus. The corpus appears exactly once,
    * in the candidate-pool scan (broadcast query vectors + per-query
    * top-NCAND, rank-filter pushed to `WindowGroupLimit` partials like
    * every top-N path here); each subsequent step is an anti-join +
    * max-aggregate + per-query argmax over ≤NQ×NCAND rows. At 100 TB
    * the query COUNT is the parallel dimension (a million queries ⇒
    * million-row step frames, still trivially partitioned); data volume
    * prices only the one candidate scan — which at scale routes through
    * the `sim_ann_*` index instead (this exact form is the semantics
    * oracle, same contract as `sim_hard_negatives`). Step frames are
    * eagerly `localCheckpoint`ed so the K-step lineage stays flat.
    *
    * All pairwise cosines — query-doc and doc-doc — go through the one
    * codegen'd [[graft.functions.CosineSimilarity]] kernel, whose
    * left-to-right double accumulation is bit-identical to DuckDB's
    * `list_dot_product` contract; argmax ties break on doc_id.
    */
  def searchMmr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cosine = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.GraftFunctions.cosineSim(spark, a, b)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("emb"))
    val qs = e.filter(col("doc_id") < MMR_NQ)
      .select(col("doc_id").as("qid"), col("emb").as("embq"))
    // one corpus pass: per-query candidate pool (self excluded)
    val cand = e.crossJoin(broadcast(qs))
      .filter(col("doc_id") =!= col("qid"))
      .withColumn("sim_q", cosine(col("embq"), col("emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim_q").desc, col("doc_id"))))
      .filter(col("rn") <= MMR_NCAND)
      .select(col("qid"), col("doc_id"), col("sim_q"), col("emb"))
      .localCheckpoint(true) // reused K+1 times below; NQ×NCAND rows
    // all within-pool pairs, scored once (NQ×NCAND×(NCAND-1) rows)
    val pair = cand.as("a")
      .join(cand.as("b"),
        $"a.qid" === $"b.qid" && $"a.doc_id" =!= $"b.doc_id")
      .select($"a.qid".as("qid"), $"a.doc_id".as("da"),
        $"b.doc_id".as("db"), cosine($"a.emb", $"b.emb").as("s"))
      .localCheckpoint(true)
    val pickW = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    // step 1: pure relevance (empty selected set ⇒ no diversity term)
    var sel = cand
      .withColumn("score", lit(MMR_LAM) * col("sim_q"))
      .withColumn("rn", row_number().over(pickW))
      .filter(col("rn") === 1)
      .select(col("qid"), col("doc_id"), col("score"),
        lit(1).as("mmr_rank"))
      .localCheckpoint(true)
    for (step <- 2 to MMR_K) {
      val selKeys = sel.select(col("qid"), col("doc_id"))
      val pick = cand
        .join(selKeys, Seq("qid", "doc_id"), "left_anti")
        .join(pair,
          pair("qid") === cand("qid") && pair("da") === cand("doc_id"))
        .join(selKeys.as("s"),
          $"s.qid" === pair("qid") && $"s.doc_id" === pair("db"))
        .groupBy(cand("qid"), cand("doc_id"), cand("sim_q"))
        .agg(max(pair("s")).as("maxs"))
        .select(cand("qid"), cand("doc_id"),
          (lit(MMR_LAM) * col("sim_q") - lit(MMR_MU) * col("maxs")).as("score"))
        .withColumn("rn", row_number().over(pickW))
        .filter(col("rn") === 1)
        .select(col("qid"), col("doc_id"), col("score"),
          lit(step).as("mmr_rank"))
      sel = sel.union(pick).localCheckpoint(true)
    }
    sel.select(col("qid"), col("doc_id"), col("mmr_rank"),
        round(col("score"), 6).as("mmr"))
      .orderBy(col("qid"), col("mmr_rank"))
  }

  /** The same greedy unrolled as K CTE steps (DuckDB has no iterative
    * construct that threads an argmax through state; K is a compile-
    * time constant, so unrolling IS the faithful oracle). Step CTEs
    * use the identical `0.7·sim − 0.3·max` double arithmetic.
    */
  private val mmrOracle: String = {
    val steps = (2 to MMR_K).map { i =>
      val prev = s"sel${i - 1}"
      s"""score$i AS (
         |  SELECT c.qid, c.doc_id,
         |    CAST($MMR_LAM AS DOUBLE)*c.sim_q
         |      - CAST($MMR_MU AS DOUBLE)*max(p.s) AS score
         |  FROM cand c
         |  JOIN pair p ON p.qid = c.qid AND p.da = c.doc_id
         |  JOIN $prev s ON s.qid = p.qid AND s.doc_id = p.db
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM $prev x WHERE x.qid = c.qid AND x.doc_id = c.doc_id)
         |  GROUP BY c.qid, c.doc_id, c.sim_q),
         |p$i AS (
         |  SELECT qid, doc_id, score, $i AS mmr_rank FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
         |    FROM score$i) WHERE rn = 1),
         |sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM p$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id AS doc_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |n AS (SELECT doc_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |qs AS (SELECT doc_id AS qid, emb AS embq, nrm AS nrmq
       |       FROM n WHERE doc_id < $MMR_NQ),
       |cand AS (
       |  SELECT qid, doc_id, sim_q, emb, nrm FROM (
       |    SELECT qs.qid, c.doc_id,
       |      list_dot_product(qs.embq, c.emb)/(qs.nrmq*c.nrm) AS sim_q,
       |      c.emb, c.nrm,
       |      row_number() OVER (
       |        PARTITION BY qs.qid
       |        ORDER BY list_dot_product(qs.embq, c.emb)/(qs.nrmq*c.nrm) DESC,
       |          c.doc_id) AS rn
       |    FROM n c, qs WHERE c.doc_id <> qs.qid)
       |  WHERE rn <= $MMR_NCAND),
       |pair AS (
       |  SELECT a.qid, a.doc_id AS da, b.doc_id AS db,
       |    list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm) AS s
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.doc_id <> b.doc_id),
       |sel1 AS (
       |  SELECT qid, doc_id, CAST($MMR_LAM AS DOUBLE)*sim_q AS score,
       |    1 AS mmr_rank
       |  FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY qid ORDER BY sim_q DESC, doc_id) AS rn
       |    FROM cand) WHERE rn = 1),
       |$steps
       |SELECT qid, doc_id, CAST(mmr_rank AS INT) AS mmr_rank,
       |  round(score, 6) AS mmr
       |FROM sel$MMR_K ORDER BY qid, mmr_rank""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("search_hybrid_rrf", Some(hybridOracle), hybridRrf),
    Q("search_mmr", Some(mmrOracle), searchMmr),
  )
}
