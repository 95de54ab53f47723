package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ------------------------------------------------------ RAG end-to-end

  private val RAG_W = 40 // chunk word budget (doc_chunking's W)
  private val RAG_S = 30 // chunk stride (doc_chunking's S)
  private val RAG_DIMS = 64 // hashed-word embedding buckets (text tower)
  private[graft] val RAG_NC = 8 // IVF cells
  private val RAG_NPROBE = 2 // cells read per query
  private val RAG_NCAND = 20 // per-leg candidate depth
  private val RAG_NPOOL = 12 // fused pool fed to MMR
  private val RAG_K = 5 // final diversified results
  private[graft] val RAG_TERMS = Seq("vector", "spark", "key") // the question

  /** 64-bucket hashed-word histogram of a words array, as
    * `array<double>` — the [[MultimodalQueries]] text tower re-spelled
    * per-row (hash each word ONCE into a bucket list, then count each
    * bucket from that int list), so chunk embedding needs NO shuffle:
    * it rides the chunk generator's narrow stage.
    */
  private def bucketHistogram(wordsCol: Column): Column = {
    val bs = transform(wordsCol,
      w => graft.operators.TextOps.h31(w) % RAG_DIMS)
    transform(sequence(lit(0), lit(RAG_DIMS - 1)),
      d => size(filter(bs, b => b === d)).cast("double"))
  }

  private[graft] val RAG_PB = 16 // postings term-hash buckets

  /** Chunk + embed frame, the index build's input: (cid, dl, cws,
    * emb). cid = doc_id·10000 + chunk_id packs the chunk key into one
    * long (chunks per doc are bounded far below 10000 by document
    * length); `cws` rides along so the build can derive the postings
    * table from the same single tokenize pass.
    */
  private[graft] def ragChunkFrame(spark: SparkSession, sfDir: String): DataFrame =
    ragChunksOf(Tables.documents(spark, sfDir))

  /** The same chunk+embed derivation from ANY `(doc_id, text)` frame —
    * the streaming maintainer ([[graft.streaming.RagIndex]]) feeds it
    * micro-batches; the batch build feeds it the whole table.
    */
  private[graft] def ragChunksOf(docs: DataFrame): DataFrame = {
    val d = docs
      .select(col("doc_id"), graft.operators.TextOps.words(col("text")).as("ws"))
      .withColumn("n", size(col("ws")))
    val ch = d
      .select(col("doc_id"), col("ws"),
        explode(expr(s"sequence(0, n - 1, $RAG_S)")).as("st"))
      .select(
        (col("doc_id") * 10000 + (col("st") / RAG_S).cast("long")).as("cid"),
        slice(col("ws"), col("st") + lit(1), lit(RAG_W)).as("cws"))
    ch.select(col("cid"), size(col("cws")).as("dl"), col("cws"),
      bucketHistogram(col("cws")).as("emb"))
  }

  /** Build-once memo for the RAG chunk index, the same lifecycle as
    * `ann_index_query`'s ([[SimilarityQueries]]): key = (app, sfDir,
    * metadata fingerprint of the documents parquet), value = (index
    * path, trained centroids). One artifact serves both retrieval
    * legs, each through its own partition-pruned layout:
    *
    * {{{
    *   idx/c_id=<cell>/part-*.parquet       (cid, dl, emb) — the IVF
    *                                        inverted lists (semantic)
    *   idx/_postings/pb=<h(word)%16>/...    (word, cid, tf, dl) — the
    *                                        postings table (lexical)
    *   idx/_stats/part-*.parquet            (n, sum_dl) partials
    * }}}
    *
    * The postings layout is the Lucene shape: per-term rows bucketed
    * by term hash, document length denormalized next to the tf (the
    * "norms" file), corpus-level stats precomputed. Serving reads
    * ONLY the query terms' buckets — O(query-term postings), not
    * O(chunks) — which is what makes the lexical leg
    * corpus-independent at 100 TB. The underscore prefix keeps
    * `spark.read.parquet(idx)` (the semantic leg) from ever listing
    * the postings, the same hidden-path convention `AnnIndex` uses
    * for `_codebook`.
    */
  private val ragIndexMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]()

  private[graft] def ragServingIndex(spark: SparkSession,
      sfDir: String): (String, DataFrame) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val md = java.security.MessageDigest.getInstance("MD5")
    Tables.documents(spark, sfDir).inputFiles.sorted.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      md.update(s"$f|${st.getLen}|${st.getModificationTime};".getBytes("UTF-8"))
    }
    val fp = md.digest().map("%02x".format(_)).mkString.take(16)
    val key = s"${spark.sparkContext.applicationId}|$sfDir|$fp"
    ragIndexMemo.computeIfAbsent(key, _ => {
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_rag_index_$fp"
      // chunk+hash+histogram runs ONCE: k-means training re-scans its
      // input per Lloyd iteration (plus the seed and the final
      // assignment), and without the checkpoint each scan would re-run
      // the tokenize/md5/histogram stage — measured 5x build cost.
      val ce = ragChunkFrame(spark, sfDir).persist()
      val vecs = ce.select(col("cid").as("vec_id"), col("emb"))
      val cent = graft.operators.Quantizer
        .trainedCentroids(spark, vecs, RAG_NC).localCheckpoint()
      ragWriteIndex(spark, ce, cent, idx)
      ce.unpersist()
      (idx, cent)
    })
  }

  /** One index publication — the three layouts from a chunk frame and
    * trained centroids. Factored out of [[ragServingIndex]] so the
    * frozen-codebook rebuild (the [[ragForget]] spec's comparison
    * twin) runs the IDENTICAL write path.
    */
  private[graft] def ragWriteIndex(spark: SparkSession, ce: DataFrame,
      cent: DataFrame, idx: String): Unit = {
    val vecs = ce.select(col("cid").as("vec_id"), col("emb"))
    val asg = graft.operators.Quantizer
      .assignNearestSlim(spark, vecs, cent)
      .select(col("vec_id").as("cid"), col("c_id"))
    // inverted lists first (the root overwrite clears the dir), then
    // the postings + stats sidecars under their hidden paths
    ce.select(col("cid"), col("dl"), col("emb"))
      .join(asg, Seq("cid"))
      .write.mode("overwrite").partitionBy("c_id").parquet(idx)
    ragPostingsOf(ce)
      .write.mode("overwrite").partitionBy("pb").parquet(s"$idx/_postings")
    writeStatsPartial(ragStatsOf(ce))(s"$idx/_stats")
  }

  /** Write a stats partial under the UNIFORM `(p, slice)` layout —
    * the batch build, the streaming maintainer's per-batch append,
    * and the post-purge refresh all produce the same directory shape,
    * so they can interleave on one index without ever mixing
    * partition depths.
    */
  private[graft] def writeStatsPartial(partial: DataFrame)(
      statsDir: String): Unit =
    partial
      .withColumn("p", lit(0L))
      .withColumn("slice", col("sid"))
      .write.mode("overwrite").partitionBy("p", "slice").parquet(statsDir)

  /** Postings rows of a chunk frame: (word, cid, tf, dl, pb). */
  private[graft] def ragPostingsOf(ce: DataFrame): DataFrame =
    ce.select(col("cid"), col("dl"), explode(col("cws")).as("word"))
      .groupBy(col("word"), col("cid"))
      .agg(count(lit(1)).cast("int").as("tf"), first(col("dl")).as("dl"))
      .withColumn("pb",
        pmod(graft.operators.TextOps.h31(col("word")), lit(RAG_PB)))

  /** Corpus-stats PARTIAL of a chunk frame: one (sid, n, sum_dl) row.
    * `_stats` holds mergeable partials, not finished averages, so a
    * streaming maintainer ([[graft.streaming.RagIndex]]) can APPEND a
    * partial per batch and the batch build stays the one-partial
    * special case; readers derive `avgdl = Σsum_dl / Σn` — for
    * integral dl that is bit-identical to `avg(dl)` (Spark's Average
    * IS exact-long-sum over count), so the oracle's `avg(dl)` twin is
    * unaffected.
    *
    * `sid` keys the partial (the writer's slice tag), which turns the
    * partial table into a SET — a SUM of anonymous partials cannot be
    * compacted crash-safely (fold-then-delete double-counts in the
    * crash window; duplicate rows inflate the sum), but keyed
    * partials dedupe by `sid`, so replay overwrites and compaction
    * races only ever DUPLICATE a row, exactly the invariant the other
    * two layouts already lean on.
    */
  private[graft] def ragStatsOf(ce: DataFrame,
      sid: String = "full"): DataFrame =
    ce.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
      .select(lit(sid).as("sid"), col("n"), col("sum_dl"))

  /** Finished corpus stats from the `_stats` partials: (n, avgdl).
    * Dedupes by `sid` first (compaction races only duplicate keyed
    * rows) and FAILS LOUDLY if no partial is present — a crashed
    * refresh leaves an empty `_stats`, and a silent null here would
    * null every BM25 score downstream; the loud error makes the
    * repair (rerun the refresh) obvious.
    */
  private[graft] def ragReadStats(spark: SparkSession, idx: String): DataFrame =
    spark.read.parquet(s"$idx/_stats")
      .dropDuplicates(Seq("sid"))
      .agg(sum(col("n")).as("n0"), sum(col("sum_dl")).as("sdl"))
      .select(
        when(col("n0").isNull,
          raise_error(lit(s"$idx/_stats holds no partials — refresh it")))
          .otherwise(col("n0").cast("double")).as("n"),
        (col("sdl").cast("double") / col("n0")).as("avgdl"))

  /** Right-to-be-forgotten for the serving index: remove a set of
    * chunks (cids) from all three layouts. [[graft.operators.Erasure]]
    * composes directly with both partitioned layouts — the inverted
    * lists are (c_id)-partitioned and the postings (pb)-partitioned,
    * so each purge rewrites only victim-bearing partitions (with
    * Erasure's staging, escaped-name, and emptied-partition
    * discipline for free). `_stats` is a DERIVED aggregate of the
    * lists, so it is refreshed from the post-purge lists (one narrow
    * scan) — stale n/avgdl would mis-normalize every BM25 score.
    * df_t needs no repair: serving derives it from the postings at
    * query time.
    *
    * Codebook-frozen semantics, same contract as
    * [[graft.streaming.AnnIndex]]'s purge: centroids learned from the
    * pre-purge corpus keep serving (retraining is a rebuild decision,
    * not an erasure side effect). Idempotent: a re-purge finds no
    * victim rows and touches nothing. StreamErasureSpec proves the
    * purged index equals a frozen-codebook rebuild over the purged
    * chunk set, layout by layout.
    */
  def ragForget(spark: SparkSession, idx: String,
      victims: DataFrame): Unit = {
    graft.operators.Erasure.erase(spark, idx, "c_id", "cid", victims)
    graft.operators.Erasure.erase(spark, s"$idx/_postings", "pb", "cid",
      victims)
    ragRefreshStats(spark, idx)
  }

  /** Replace the `_stats` partials with one partial recomputed from
    * the (post-purge) inverted lists. The overwrite's crash window
    * (dir cleared, partial not yet written) is LOUD — [[ragReadStats]]
    * raises on an empty stats table — and the rerun repairs it; a
    * stale-stats alternative would silently mis-normalize every BM25
    * score, which is worse than stopping.
    */
  private[graft] def ragRefreshStats(spark: SparkSession,
      idx: String): Unit =
    writeStatsPartial(
      spark.read.parquet(idx)
        // a MAINTAINED index may carry transient slice duplicates
        // (compaction races) — the refresh counts CHUNKS, not rows
        .dropDuplicates(Seq("cid"))
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
        .select(lit("full").as("sid"), col("n"), col("sum_dl"))
        .localCheckpoint(true))(s"$idx/_stats")

  /** The serve-side read of the postings sidecar: the query terms'
    * buckets ONLY. term→bucket goes through the same engine expression
    * the build used (a collect of ≤|terms| constants), so the bucket
    * filter is a LITERAL partition predicate — the lexical analog of
    * the semantic leg's probed-cells read: O(query-term postings),
    * never O(chunks). Plan-asserted in RetrievalSpec.
    */
  private[graft] def ragPostings(spark: SparkSession, idx: String): DataFrame = {
    val termBuckets = spark.range(1)
      .select(explode(array(RAG_TERMS.map(t =>
        pmod(graft.operators.TextOps.h31(lit(t)), lit(RAG_PB))): _*)).as("b"))
      .distinct().collect().map(_.getLong(0)).sorted
    spark.read.parquet(s"$idx/_postings")
      .filter(col("pb").isin(termBuckets: _*)) // literal partition filter
      .filter(col("word").isin(RAG_TERMS: _*))
  }

  /** The composed RAG pipeline, end to end as ONE gated query (round
    * 8): chunk → embed → index → hybrid retrieve → MMR rerank. Every
    * leg already hash-gates individually (`doc_chunking`, the
    * multimodal text tower, `ann_index_build`/`ann_index_query`,
    * `search_hybrid_rrf`, `search_mmr`); this query proves the
    * interfaces actually COMPOSE — the chunker's output is the
    * embedder's input, the embedder's vectors are the index's rows,
    * both retrieval legs read the one index artifact, and the fused
    * pool is the reranker's candidate set.
    *
    * Serving story for one literal question ("vector spark key"):
    *  - '''semantic leg''': the question's text-tower embedding probes
    *    the [[RAG_NC]]-cell IVF chunk index — top-[[RAG_NPROBE]]
    *    cells by centroid cosine, collected (bounded ≤ NPROBE ids) so
    *    the cell filter is a LITERAL partition predicate
    *    (PartitionFilters, the `ann_index_query` lookup discipline);
    *    exact cosine over only those cells' chunks → top-[[RAG_NCAND]].
    *  - '''lexical leg''': BM25 from the POSTINGS sidecar built next
    *    to the inverted lists — rows (word, cid, tf, dl) bucketed by
    *    term hash, the Lucene layout. Serving reads only the query
    *    terms' buckets (literal partition filter, the lexical analog
    *    of probed cells), so the leg is O(query-term postings), not
    *    O(chunks); corpus stats come precomputed from the `_stats`
    *    sidecar; closed-form score → top-[[RAG_NCAND]].
    *  - '''fusion''': reciprocal-rank fusion of the two bounded
    *    candidate frames (rank-after-limit windows, ≤NCAND rows by
    *    construction — the `search_hybrid_rrf` shape).
    *  - '''rerank''': maximal-marginal-relevance over the fused
    *    top-[[RAG_NPOOL]] pool (embeddings fetched from the index by
    *    broadcast key join — the serving-side document fetch), K
    *    greedy steps over ≤NPOOL-row frames (the `search_mmr` shape).
    *
    * 100 TB shape: the index build is amortized (memoized per corpus
    * fingerprint — rebuilt only when the corpus changes, exactly the
    * `AnnIndex.maintain` lifecycle); per query the semantic leg reads
    * O(corpus/NC·NPROBE) and the lexical leg one narrow stats scan
    * (at scale: a pre-aggregated postings table); everything after
    * the two top-NCAND gates is bounded by candidate depth, not data.
    *
    * The oracle replays the ENTIRE pipeline in DuckDB — chunking,
    * hashed embedding, k-means training, cell assignment, probing,
    * BM25, RRF, and the K unrolled MMR steps — composed from the same
    * SQL fragments the leg oracles use.
    */
  def ragPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cosine = (a: Column, b: Column) =>
      graft.functions.GraftFunctions.cosineSim(spark, a, b)
    val (idx, cent) = ragServingIndex(spark, sfDir)
    val q = spark.range(1).select(
      bucketHistogram(array(RAG_TERMS.map(lit): _*)).as("qemb"))
    // ---- probe selection: top-NPROBE cells by centroid cosine ----
    val probed = cent.crossJoin(broadcast(q))
      .select(col("c_id"), cosine(col("qemb"), col("c_emb")).as("c_cos"))
      .orderBy(col("c_cos").desc, col("c_id")).limit(RAG_NPROBE)
      .select(col("c_id")).collect().map(_.getLong(0)).sorted
    val lists = spark.read.parquet(idx)
    // ---- semantic leg: probed cells only (literal partition filter) ----
    val semTop = lists.filter(col("c_id").isin(probed: _*))
      .select(col("cid"), col("emb"))
      .crossJoin(broadcast(q))
      .select(col("cid"), cosine(col("qemb"), col("emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("cid")).limit(RAG_NCAND)
    val sem = semTop
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("cosine").desc, col("cid"))))
      .select(col("cid"), col("sem_rank"))
    // ---- lexical leg: the query terms' postings ONLY ----
    // consumed twice (tf pivot + df count) — both consumers re-read
    // the pruned buckets rather than checkpointing: the two scans are
    // partition-filtered term lists, cheaper than a materialization job
    val posts = ragPostings(spark, idx)
    val tfAggs = first(col("dl")).as("dl") +:
      RAG_TERMS.zipWithIndex.map { case (t, i) =>
        sum(when(col("word") === t, col("tf")).otherwise(0))
          .cast("int").as(s"tf$i")
      }
    val lt = posts.groupBy(col("cid")).agg(tfAggs.head, tfAggs.tail: _*)
    // df_t = postings rows for t (one per chunk containing it);
    // n/avgdl come from the build-time _stats sidecar — the same
    // values the full-scan form aggregated, precomputed
    val dfAggs = RAG_TERMS.zipWithIndex.map { case (t, i) =>
      sum(when(col("word") === t, 1).otherwise(0)).cast("double").as(s"df$i")
    }
    val stats = ragReadStats(spark, idx)
      .crossJoin(posts.agg(dfAggs.head, dfAggs.tail: _*))
    val k1 = 1.2
    val b = 0.75
    // identical expression tree to TextQueries.bm25Scored, over chunks
    val score = RAG_TERMS.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val norm = tf * (k1 + 1) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
      when(tf > 0, idf * norm).otherwise(lit(0.0))
    }.reduce(_ + _)
    val lexTop = lt.crossJoin(broadcast(stats))
      .select(col("cid"), round(score, 4).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("cid")).limit(RAG_NCAND)
    val lex = lexTop
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("cid"))))
      .select(col("cid"), col("lex_rank"))
    // ---- reciprocal-rank fusion → candidate pool ----
    val pool = lex.join(sem, Seq("cid"), "full_outer")
      .select(col("cid"),
        round(
          coalesce(lit(1.0) / (lit(RRF_K) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RRF_K) + col("sem_rank")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("cid")).limit(RAG_NPOOL)
    // ---- MMR rerank over the pool (embedding fetch by key join) ----
    val pe = lists.select(col("cid"), col("emb"))
      .join(broadcast(pool.select(col("cid"))), Seq("cid"))
      .crossJoin(broadcast(q))
      .select(col("cid"), col("emb"), cosine(col("qemb"), col("emb")).as("sim_q"))
      .localCheckpoint(true) // ≤NPOOL rows, reused K+1 times
    val pair = pe.as("a")
      .join(pe.as("b"), $"a.cid" =!= $"b.cid")
      .select($"a.cid".as("da"), $"b.cid".as("db"),
        cosine($"a.emb", $"b.emb").as("s"))
      .localCheckpoint(true)
    val pickW = Window.orderBy(col("score").desc, col("cid"))
    var sel = pe
      .withColumn("score", lit(MMR_LAM) * col("sim_q"))
      .withColumn("rn", row_number().over(pickW))
      .filter(col("rn") === 1)
      .select(col("cid"), col("score"), lit(1).as("mmr_rank"))
      .localCheckpoint(true)
    for (step <- 2 to RAG_K) {
      val selKeys = sel.select(col("cid"))
      val pick = pe
        .join(selKeys, Seq("cid"), "left_anti")
        .join(pair, pair("da") === pe("cid"))
        .join(selKeys.as("s"), $"s.cid" === pair("db"))
        .groupBy(pe("cid"), pe("sim_q"))
        .agg(max(pair("s")).as("maxs"))
        .select(pe("cid"),
          (lit(MMR_LAM) * col("sim_q") - lit(MMR_MU) * col("maxs")).as("score"))
        .withColumn("rn", row_number().over(pickW))
        .filter(col("rn") === 1)
        .select(col("cid"), col("score"), lit(step).as("mmr_rank"))
      sel = sel.union(pick).localCheckpoint(true)
    }
    sel.select(expr("cid div 10000").as("doc_id"),
        (col("cid") % 10000).cast("int").as("chunk_id"),
        col("mmr_rank"), round(col("score"), 6).as("mmr"))
      .orderBy(col("mmr_rank"))
  }

  /** The full-pipeline DuckDB replay: every engine stage has its CTE
    * twin here, composed from the leg oracles' fragments (chunking =
    * `doc_chunking`'s, embedding = the text tower's bucket hash,
    * training = [[graft.operators.Quantizer.trainedCentroidsSql]],
    * BM25 = `text_bm25`'s closed form, MMR = `search_mmr`'s unrolled
    * greedy).
    *
    * The multiply-referenced upstream CTEs (`ch` ×2, `n` ×5, `cent`
    * ×3, `pe` ×{K+1}) are declared `AS MATERIALIZED`: DuckDB's
    * default CTE inlining re-expands the whole chunk→hash→embed→train
    * pipeline at every reference, which at sf0.1 turned a 3-second
    * oracle into a 200 GB temp-spill death (measured both ways —
    * 2.8 s materialized vs out-of-disk inlined).
    */
  private val ragOracle: String = {
    val h = (s: String) => graft.operators.TextOps.h31Sql(s)
    val bmTerm = (i: Int) =>
      s"""(CASE WHEN tf$i > 0 THEN ln(1.0 + (n - df$i + 0.5)/(df$i + 0.5))
         |        * (CAST(tf$i AS DOUBLE) * 2.2)/(CAST(tf$i AS DOUBLE) + 1.2*(0.25 + 0.75*dl/avgdl)) ELSE 0.0 END)"""
        .stripMargin
    val mmrSteps = (2 to RAG_K).map { i =>
      val prev = s"g${i - 1}"
      s"""sc$i AS (
         |  SELECT c.cid,
         |    CAST($MMR_LAM AS DOUBLE)*c.sim_q
         |      - CAST($MMR_MU AS DOUBLE)*max(p.s) AS score
         |  FROM pe c
         |  JOIN pp p ON p.da = c.cid
         |  JOIN $prev s ON s.cid = p.db
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM $prev x WHERE x.cid = c.cid)
         |  GROUP BY c.cid, c.sim_q),
         |pk$i AS (
         |  SELECT cid, score, $i AS mmr_rank FROM (
         |    SELECT *, row_number() OVER (ORDER BY score DESC, cid) AS rn
         |    FROM sc$i) WHERE rn = 1),
         |g$i AS (SELECT * FROM g${i - 1} UNION ALL SELECT * FROM pk$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH d0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    len(string_split(text, ' ')) AS nw
       |  FROM documents),
       |ch AS MATERIALIZED (
       |  SELECT doc_id*10000 + CAST(st/$RAG_S AS BIGINT) AS cid,
       |    list_slice(ws, st + 1, least(st + $RAG_W, nw)) AS cws
       |  FROM d0, unnest(generate_series(0, nw - 1, $RAG_S)) t(st)),
       |n AS MATERIALIZED (
       |  SELECT cid AS vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
       |  FROM (
       |    SELECT cid, list_transform(generate_series(0, ${RAG_DIMS - 1}),
       |        d -> CAST(len(list_filter(bs, b -> b = d)) AS DOUBLE)) AS emb
       |    FROM (SELECT cid,
       |        list_transform(cws, w -> ${h("w")} % $RAG_DIMS) AS bs
       |      FROM ch))),
       |${graft.operators.Quantizer.trainedCentroidsSql(RAG_NC)
            .replace("cent AS (", "cent AS MATERIALIZED (")},
       |asg AS (
       |  SELECT vec_id AS cid, c_id FROM (
       |    SELECT n.vec_id, c.c_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.emb, c.c_emb)/(n.nrm*c.c_nrm) DESC,
       |          c.c_id) AS rk
       |    FROM n, cent c) WHERE rk = 1),
       |qn AS (
       |  SELECT qemb, sqrt(list_dot_product(qemb, qemb)) AS qnrm FROM (
       |    SELECT list_transform(generate_series(0, ${RAG_DIMS - 1}),
       |      d -> CAST(len(list_filter(
       |        list_transform(${RAG_TERMS.map("'" + _ + "'").mkString("[", ",", "]")},
       |          w -> ${h("w")} % $RAG_DIMS),
       |        b -> b = d)) AS DOUBLE)) AS qemb)),
       |pr AS (
       |  SELECT c_id FROM (
       |    SELECT c.c_id, row_number() OVER (
       |      ORDER BY list_dot_product(q.qemb, c.c_emb)/(q.qnrm*c.c_nrm) DESC,
       |        c.c_id) AS rk
       |    FROM cent c, qn q) WHERE rk <= $RAG_NPROBE),
       |sem0 AS (
       |  SELECT n.vec_id AS cid,
       |    list_dot_product(q.qemb, n.emb)/(q.qnrm*n.nrm) AS cosine
       |  FROM n JOIN asg ON n.vec_id = asg.cid, qn q
       |  WHERE asg.c_id IN (SELECT c_id FROM pr)
       |  ORDER BY cosine DESC, cid LIMIT $RAG_NCAND),
       |sem AS (
       |  SELECT cid, CAST(row_number() OVER (ORDER BY cosine DESC, cid) AS INT)
       |    AS sem_rank
       |  FROM sem0),
       |lt AS (
       |  SELECT cid, len(cws) AS dl,
       |${RAG_TERMS.zipWithIndex.map { case (t, i) =>
            s"    len(list_filter(cws, x -> x = '$t')) AS tf$i"
          }.mkString(",\n")}
       |  FROM ch),
       |ls AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
       |${RAG_TERMS.indices.map(i =>
            s"    CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
          .mkString(",\n")}
       |  FROM lt),
       |lex0 AS (
       |  SELECT cid, bm25 FROM (
       |    SELECT cid, round(${RAG_TERMS.indices.map(bmTerm).mkString("\n    + ")}, 4) AS bm25
       |    FROM lt, ls)
       |  WHERE bm25 > 0 ORDER BY bm25 DESC, cid LIMIT $RAG_NCAND),
       |lex AS (
       |  SELECT cid, CAST(row_number() OVER (ORDER BY bm25 DESC, cid) AS INT)
       |    AS lex_rank
       |  FROM lex0),
       |pool AS (
       |  SELECT COALESCE(lex.cid, sem.cid) AS cid,
       |    round(COALESCE(CAST(1.0 AS DOUBLE)/($RRF_K + lex_rank), 0)
       |        + COALESCE(CAST(1.0 AS DOUBLE)/($RRF_K + sem_rank), 0), 6) AS rrf
       |  FROM lex FULL OUTER JOIN sem ON lex.cid = sem.cid
       |  ORDER BY rrf DESC, cid LIMIT $RAG_NPOOL),
       |pe AS MATERIALIZED (
       |  SELECT p.cid, n.emb, n.nrm,
       |    list_dot_product(q.qemb, n.emb)/(q.qnrm*n.nrm) AS sim_q
       |  FROM pool p JOIN n ON n.vec_id = p.cid, qn q),
       |pp AS (
       |  SELECT a.cid AS da, b.cid AS db,
       |    list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm) AS s
       |  FROM pe a JOIN pe b ON a.cid <> b.cid),
       |g1 AS (
       |  SELECT cid, CAST($MMR_LAM AS DOUBLE)*sim_q AS score, 1 AS mmr_rank
       |  FROM (
       |    SELECT *, row_number() OVER (ORDER BY sim_q DESC, cid) AS rn
       |    FROM pe) WHERE rn = 1),
       |$mmrSteps
       |SELECT cid // 10000 AS doc_id, CAST(cid % 10000 AS INT) AS chunk_id,
       |  CAST(mmr_rank AS INT) AS mmr_rank, round(score, 6) AS mmr
       |FROM g$RAG_K ORDER BY mmr_rank""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("search_hybrid_rrf", Some(hybridOracle), hybridRrf),
    Q("search_mmr", Some(mmrOracle), searchMmr),
    Q("rag_pipeline", Some(ragOracle), ragPipeline),
  )
}
