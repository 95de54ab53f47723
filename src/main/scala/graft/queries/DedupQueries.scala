package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Deduplication query family over `documents` / `embeddings`
  * (SURVEY.md §7.2 M4 / the LLM-pipeline north star).
  *
  * Scale notes (100 TB): [[exact]] is one hash-shuffle; [[minhashLsh]]
  * shuffles only (doc, band-key) rows and compares within buckets —
  * never all pairs; [[jaccardPairs]] (exhaustive with a sound
  * size-ratio block) exists as the semantics reference and is what the
  * LSH path must reproduce; at scale you run the LSH form. SimHash
  * pairs are blocked by pigeonhole half-signature equi-joins — no
  * all-pairs comparison anywhere in the family.
  */
object DedupQueries {

  /** Exact dedup groups by full-content hash: surviving doc + copy
    * count per group (`drop_duplicates` done scalably: one shuffle on
    * a 128-bit key, no row comparisons).
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  private val exactOracle =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** Incremental-ingest dedup — the production form of exact dedup:
    * an incoming batch (here docs with doc_id % 5 = 0) is admitted
    * only if its content fingerprint is absent from the existing
    * corpus (the rest), via LEFT ANTI join on md5(text). At 100 TB
    * the corpus side is the big one, so the anti join shuffles on the
    * fingerprint (SMJ/shuffled-hash — never broadcast the corpus) and
    * Spark's InjectRuntimeFilter can bloom-prefilter the corpus scan
    * from the batch's fingerprints (the regime QueryPlanSpec pins).
    * In-batch duplicates collapse first (keep lowest doc_id) so a
    * batch never admits two copies of the same content.
    */
  def incremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), md5(col("text")).as("fp"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    batch.join(corpus, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  private val incrementalOracle =
    """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |batch AS (
      |  SELECT fp, min(doc_id) AS doc_id FROM d WHERE doc_id % 5 = 0 GROUP BY fp)
      |SELECT doc_id, fp FROM batch
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM d c WHERE c.doc_id % 5 <> 0 AND c.fp = batch.fp)
      |ORDER BY doc_id""".stripMargin

  // ---- shared shingle CTE for the Jaccard-family oracles ----
  private val shingleSql =
    s"""WITH ws AS (SELECT doc_id, ${TextOps.wordsSql} AS ws FROM documents),
       |sh AS (SELECT doc_id, ${TextOps.shingles3Sql("ws")} AS s FROM ws),
       |sz AS (SELECT doc_id, s, len(s) AS n FROM sh WHERE len(s) > 0)""".stripMargin

  // the exhaustive ≥0.8 Jaccard pair SELECT (no ORDER BY — reused as a
  // CTE body by the clustering oracle)
  private val pairSelect =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / (a.n + b.n - len(list_intersect(a.s, b.s))), 4) AS jaccard
      |FROM sz a JOIN sz b
      |  ON a.doc_id < b.doc_id AND a.n*5 >= b.n*4 AND b.n*5 >= a.n*4
      |WHERE 5*len(list_intersect(a.s, b.s)) >= 4*(a.n + b.n - len(list_intersect(a.s, b.s)))""".stripMargin

  // oracle for BOTH the exhaustive query and the LSH query (LSH params
  // are sized for recall ≈ 1 at t=0.8: 16 bands × 2 rows ⇒
  // P(miss | j=0.8) < 1e-7)
  private val jaccardPairsSql =
    shingleSql + "\n" + pairSelect + "\nORDER BY id_a, id_b"

  /** Exact n-gram (word-3-shingle) Jaccard near-dup pairs at t=0.8 via
    * PREFIX FILTERING (AllPairs/PPJoin-style similarity join — the
    * published exact algorithm for set-similarity at scale):
    *
    *  1. rank each doc's shingle hashes rarest-first (global document
    *     frequency, tie-broken by hash);
    *  2. index only each doc's PREFIX of length n−⌈t·n⌉+1 — two sets
    *     with jaccard ≥ t MUST share a prefix token (pigeonhole), so
    *     this blocking is sound, not approximate;
    *  3. equi-join prefixes (+ sound size-ratio filter), then
    *     exact-verify the few candidates with an array intersection.
    *
    * A naive inverted-index join here materializes Σ df² ≈ 10⁸ rows on
    * this corpus (tiny vocabulary ⇒ huge shingle df) and ran 287 s at
    * sf0.1. Two further cuts (round 2):
    *  - POSITIONAL filtering (PPJoin): a prefix match at 1-based ranks
    *    (rk_a, rk_b) bounds the overlap by
    *    `least(rk_a, rk_b) + least(n_a−rk_a, n_b−rk_b)` (matches
    *    strictly before the ranks, this match, matches after); a pair
    *    whose TIGHTEST bound misses `9·∩ ≥ 4·(n_a+n_b)` (⟺ j ≥ 0.8)
    *    cannot qualify and is pruned before verification.
    *  - verification intersects SORTED h60 LONG arrays with the
    *    codegen'd two-pointer merge ([[Dedup.hashSets]]) instead of
    *    `array_intersect` on shingle strings — the round-1 bench spent
    *    most of its 733 s there.
    * Threshold tests stay in integer arithmetic (5·∩ ≥ 4·∪).
    */
  def jaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sz = Dedup.shingled(Tables.documents(spark, sfDir), col("doc_id"), col("text"))
    // (shingled() persists its base internally — shared with
    // minhashLsh via cache-manager plan matching; hashes join on
    // 8-byte h60 keys, never shingle strings)
    val ex = Dedup.explodedHashes(sz)
    val hsz = Dedup.hashSets(sz)
    val dfH = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("h"))
    // prefix length for t=0.8: n − ⌈0.8·n⌉ + 1 (Column `/` is double
    // division, so ⌈4n/5⌉ = floor((4n+4)/5) — exact for any sane n)
    val prefixLen = col("n") - floor((col("n") * 4 + 4) / 5).cast("int") + 1
    val pref = ex.join(broadcast(dfH), "h")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= prefixLen)
      .select(col("id"), col("n"), col("rk"), col("h"))
    val ubound = least(col("rk_a"), col("rk_b")) +
      least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b"))
    val cand = pref
      .select(col("id").as("id_a"), col("n").as("n_a"), col("rk").as("rk_a"), col("h"))
      .join(pref
        .select(col("id").as("id_b"), col("n").as("n_b"), col("rk").as("rk_b"), col("h")),
        Seq("h"))
      .filter(col("id_a") < col("id_b") &&
        col("n_a") * 5 >= col("n_b") * 4 && col("n_b") * 5 >= col("n_a") * 4)
      .groupBy(col("id_a"), col("n_a"), col("id_b"), col("n_b"))
      .agg(min(ubound).as("ub"))
      .filter(col("ub") * 9 >= (col("n_a") + col("n_b")) * 4)
    val withSets = cand
      .join(hsz.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(hsz.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
    val inter = graft.functions.GraftFunctions
      .sortedIntersectSize(spark, col("hs_a"), col("hs_b"))
    val union = col("n_a") + col("n_b") - inter
    withSets
      .filter(inter * 5 >= union * 4)
      .select(col("id_a"), col("id_b"),
        round(inter.cast("double") / union, 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash + LSH near-dup pairs — the 100 TB path. 32 permutation
    * minima per doc, banded 16×2; only band-key buckets are joined;
    * candidates are exact-verified at t=0.8. Output is identical to
    * [[jaccardPairs]] (the oracle IS the exhaustive SQL) because the
    * band parameters put the miss probability at j≥0.8 below 1e-7.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val numHashes = 32
    // shingled() persists its base internally — referenced by the band
    // self-join AND both sides of the verification join (recomputing it
    // 4× ran 150 s at sf0.1)
    val sz = Dedup.shingled(Tables.documents(spark, sfDir), col("doc_id"), col("text"))
    // ONE aggregation over the exploded hashes produces BOTH per-doc
    // artifacts (round 15): the 32 fused permutation minima (the
    // signature) AND the sorted hash-set array the verification join
    // intersects. The former shape ran two independent groupBy(id)
    // passes over the exploded corpus — two explode+md5 evaluations and
    // two corpus-sized exchanges; this halves both. (The signature
    // stays 32 codegen'd min() exprs, not array lambdas — round-2
    // lesson unchanged.)
    val ex = Dedup.explodedHashes(sz)
    val mins = (0 until numHashes).map(i =>
      min(((col("h") % TextOps.P31) * Dedup.aCoef(i) + Dedup.bCoef(i)) % TextOps.P31)
        .as(s"m$i"))
    val perDocAggs = Seq(
      sort_array(collect_list(col("h"))).as("hs"), max(col("n")).as("n")) ++ mins
    val perDoc = ex.groupBy(col("id"))
      .agg(perDocAggs.head, perDocAggs.tail: _*)
      .persist()
    val hsz = perDoc.select(col("id"), col("hs"), col("n"))
    val bandStructs = (0 until numHashes / 2).map { j =>
      struct(lit(j).as("band"),
        concat_ws("_", col(s"m${2 * j}"), col(s"m${2 * j + 1}")).as("key"))
    }
    val bandRows = perDoc
      .select(col("id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.key").as("key"))
      .persist()
    val cand = bandRows.alias("x")
      .join(bandRows.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val withSets = cand
      .join(hsz.select(col("id").as("id_a"), col("hs").as("hs_a"), col("n").as("n_a")), "id_a")
      .join(hsz.select(col("id").as("id_b"), col("hs").as("hs_b"), col("n").as("n_b")), "id_b")
    val inter = graft.functions.GraftFunctions
      .sortedIntersectSize(spark, col("hs_a"), col("hs_b"))
    val union = col("n_a") + col("n_b") - inter
    withSets
      .filter(inter * 5 >= union * 4)
      .select(col("id_a"), col("id_b"),
        round(inter.cast("double") / union, 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs: 60-bit signature = per-bit majority vote
    * of distinct-word hashes; pairs at hamming distance ≤ 1 (the
    * synthetic corpus has a ~31-word vocabulary, so distinct-word
    * signatures cluster tightly; the threshold is a parameter).
    * Signature construction is one explode + two aggregations; the
    * pair CANDIDATES come from pigeonhole banding — a pair at hamming
    * distance ≤ 1 differs in at most one bit, which lives in one of
    * the two 30-bit halves, so the pair agrees EXACTLY on at least one
    * half. Two equi-joins on the halves (hash joins, never an
    * all-pairs nested loop) + a popcount residual replace the round-1
    * `id_a < id_b` theta join (149 s / O(n²) at scale). The same
    * construction generalizes to hamming ≤ k with k+1 bands.
    */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val wd = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(TextOps.words(col("text")))).as("w"))
      .select(col("doc_id"), TextOps.h60(col("w")).as("h"))
    // 60 fused aggregate expressions in ONE HashAggregateExec (not a
    // 60-way explode): bit j's majority vote and its weight are
    // folded into a single sum-reduce per signature.
    val sigExpr = (0 until 60).map { j =>
      when(sum(when(expr(s"shiftright(h, $j) & 1") === 1, 1).otherwise(-1)) > 0,
        1L << j).otherwise(0L)
    }.reduce(_ + _)
    // persisted: each half-join references both sides (4 refs total)
    val sig = wd.groupBy(col("doc_id")).agg(sigExpr.as("sg"))
      .withColumn("hi", expr("shiftright(sg, 30)"))
      .withColumn("lo", expr("sg & 1073741823"))
      .persist()
    def side(p: String) = sig.select(
      col("doc_id").as(s"id_$p"), col("sg").as(s"sg_$p"),
      col("hi").as(s"hi_$p"), col("lo").as(s"lo_$p"))
    val a = side("a")
    val b = side("b")
    // popcount residual INSIDE each join (before the union-distinct):
    // the distinct then shuffles only true near-dup pairs, not every
    // bucket pair — on a clustered corpus that's orders of magnitude
    // fewer rows
    def half(key: String) =
      a.join(b, col(s"${key}_a") === col(s"${key}_b") && col("id_a") < col("id_b"))
        .withColumn("hamming", expr("CAST(bit_count(sg_a ^ sg_b) AS INT)"))
        .filter(col("hamming") <= 1)
        .select(col("id_a"), col("id_b"), col("hamming"))
    half("hi").unionByName(half("lo")).distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Near-dup CLUSTERS: connected components over the LSH pair list
    * (pairs chain transitively — A~B, B~C ⇒ one cluster {A,B,C} even
    * though A,C were never compared). Candidate pairs come from the
    * scale path ([[minhashLsh]]); the component labels come from
    * Pregel-style min-label propagation
    * ([[Dedup.connectedComponents]]). The oracle computes the same
    * transitive closure with a recursive CTE over the exhaustive pair
    * SQL — valid because the LSH pair set is oracle-identical to the
    * exhaustive one.
    */
  def clusters(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.connectedComponents(
        minhashLsh(spark, sfDir).select(col("id_a"), col("id_b")))
      .orderBy(col("id"))

  /** Same clusters via the alternating large-star/small-star algorithm
    * (O(log n) rounds vs label-prop's O(diameter) — see
    * [[Dedup.connectedComponentsStar]]); shares [[clusters]]' oracle,
    * so the two independent CC implementations cross-check each other
    * through one transitive-closure ground truth.
    */
  def clustersStar(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.connectedComponentsStar(
        minhashLsh(spark, sfDir).select(col("id_a"), col("id_b")))
      .orderBy(col("id"))

  // transitive-closure CTE prefix shared by the clusters and
  // keep-best oracles: …, cc(id, cluster)
  private val ccCte =
    shingleSql.replaceFirst("WITH ", "WITH RECURSIVE ") + ",\n" +
      "pairs AS (\n" + pairSelect + "),\n" +
      """edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |cc AS (SELECT src AS id, least(src, min(dst)) AS cluster
        |       FROM reach GROUP BY src)""".stripMargin

  private val clustersOracle =
    ccCte + "\nSELECT id, cluster FROM cc ORDER BY id"

  /** The DEDUP DECISION: near-dup clusters joined with the quality
    * score ([[TextQueries.quality]]'s formula) — per clustered doc,
    * keep the highest-quality member (ties → smallest id), drop the
    * rest. This is the step a curation pipeline actually executes:
    * pairs → clusters → one representative per cluster. At 100 TB the
    * cluster table is a tiny fraction of the corpus (only docs with a
    * near-dup), the quality join shuffles on doc id, and the per-
    * cluster argmax is one window over clusters — no full-corpus
    * shuffle anywhere.
    */
  def keepBest(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = Dedup.connectedComponents(
      minhashLsh(spark, sfDir).select(col("id_a"), col("id_b")))
    val ws = TextOps.words(col("text"))
    val nWords = size(ws)
    val nStop = size(filter(ws, w => w.isInCollection(TextQueries.stopwords)))
    val q = (lit(1.0) - nStop.cast("double") / nWords) *
      least(lit(1.0), nWords.cast("double") / 100.0)
    val qdf = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), q.as("q"))
    val w = Window.partitionBy(col("cluster")).orderBy(col("q").desc, col("id"))
    cc.join(qdf, "id")
      .withColumn("keep", (row_number().over(w) === 1).cast("int"))
      .select(col("id"), col("cluster"),
        round(col("q"), 6).as("quality_score"), col("keep"))
      .orderBy(col("id"))
  }

  private val keepBestOracle = {
    val stop = TextQueries.stopwords.map(s => s"'$s'").mkString(", ")
    ccCte + ",\n" +
      s"""q AS (
         |  SELECT doc_id AS id,
         |    (1.0 - CAST(len(list_filter(ws, w -> w IN ($stop))) AS DOUBLE)/len(ws))
         |      * least(1.0, CAST(len(ws) AS DOUBLE)/100.0) AS q
         |  FROM (SELECT doc_id, ${TextOps.wordsSql} AS ws FROM documents))
         |SELECT cc.id, cc.cluster, round(q.q, 6) AS quality_score,
         |  CAST(CASE WHEN row_number() OVER (
         |      PARTITION BY cc.cluster ORDER BY q.q DESC, cc.id) = 1
         |    THEN 1 ELSE 0 END AS INT) AS keep
         |FROM cc JOIN q ON cc.id = q.id
         |ORDER BY cc.id""".stripMargin
  }

  private val simhashOracle =
    s"""WITH wd AS (
       |  SELECT doc_id, ${TextOps.h60Sql("w")} AS h
       |  FROM (SELECT doc_id, unnest(list_distinct(${TextOps.wordsSql})) AS w
       |        FROM documents)),
       |sv AS (
       |  SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS sv
       |  FROM wd, generate_series(0, 59) t(j) GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN sv > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sg
       |  FROM sv GROUP BY doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sg, b.sg)) AS INT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sg, b.sg)) <= 1
       |ORDER BY id_a, id_b""".stripMargin

  /** Embedding-cosine near-dup pairs (threshold tuned to the synthetic
    * data's similarity range — measured max pairwise cosine is 0.51,
    * so sub-quadratic blocking is impossible HERE: at 63° the
    * hyperplane-agreement probability is 0.65/bit, too weak for LSH
    * recall, and triangle-inequality cell blocking admits every cell
    * pair on a near-orthogonal corpus. Exact all-pairs at a loose
    * threshold is inherently O(n²) compute; the sub-quadratic paths
    * for genuinely clustered corpora are `sim_ann_lsh`/`sim_ann_ivf`).
    *
    * What CAN be fixed at scale is the SHAPE of the O(n²): the round-1
    * `id_a < id_b` theta join planned a BroadcastNestedLoopJoin — one
    * copy of the whole table on every executor and a single-threaded
    * pair loop per partition. This is now a 1-Bucket-Theta grid join
    * (Okcan & Riedewald, SIGMOD'11): each vector lands in one of B
    * row-blocks; the B(B+1)/2 block-pairs are the EQUI-join key; each
    * row replicates to the ≤B buckets whose pair includes its block.
    * Shuffle volume is O(n·B) rows, every bucket holds (n/B)² work,
    * and the plan is a hash/sort-merge join — no broadcast of the
    * corpus, no nested loop, perfectly balanced compute. Dot products
    * accumulate sequentially in double ([[Dedup.dot]]) ⇒ bit-identical
    * to the oracle's `list_dot_product`.
    */
  def embeddingCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val B = 8 // at scale: B ≈ sqrt(n² / rows-per-task); 8 keeps 36 buckets on 32 cores
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("blk", (col("vec_id") % B).cast("int"))
    // block k feeds buckets (k, j≥k) as the LEFT side and (i≤k, k) as
    // the RIGHT side; bucket id = i*B + j. Plain sequence + arithmetic
    // (codegen'd), no higher-order functions.
    val left = e
      .withColumn("j", explode(expr(s"sequence(blk, ${B - 1})")))
      .select((col("blk") * B + col("j")).as("bp"),
        col("vec_id").as("id_l"), col("emb").as("emb_l"), col("blk").as("blk_l"))
    val right = e
      .withColumn("i", explode(expr("sequence(0, blk)")))
      .select((col("i") * B + col("blk")).as("bp"),
        col("vec_id").as("id_r"), col("emb").as("emb_r"), col("blk").as("blk_r"))
    // native codegen'd expression (graft.functions.CosineSimilarity) —
    // same bit-exact arithmetic as the oracle's list_dot_product form
    // (argument order is irrelevant: same index-order multiply-add)
    val cos = graft.functions.GraftFunctions.cosineSim(spark, col("emb_l"), col("emb_r"))
    left.join(right, "bp")
      // diagonal buckets pair a block with itself: keep each unordered
      // pair once; off-diagonal buckets see each pair exactly once
      .filter(col("blk_l") < col("blk_r") || col("id_l") < col("id_r"))
      .filter(cos >= 0.45)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        round(cos, 6).as("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val embeddingCosineOracle =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings),
      |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 6) AS cosine
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm) >= 0.45
      |ORDER BY id_a, id_b""".stripMargin

  /** Exact substring-window dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": repeated spans are
    * memorization fuel even when whole documents differ). Simplified
    * to fixed 8-word windows: every window of every doc (native
    * codegen'd [[graft.functions.WordNGrams]] — the same kernel as
    * `text_ngram_vocab`), distinct per doc, grouped to find spans
    * shared by ≥ 2 documents, with sorted doc postings per span.
    * Shape at 100 TB: one (window, doc) distinct + one window groupBy
    * — the published suffix-array approach trades this shuffle volume
    * for a global sort; the windowed form is embarrassingly
    * shuffle-parallel and catches spans ≥ the window width.
    */
  def substringDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      // per-doc distinct BEFORE the explode (round 15): windows only
      // repeat WITHIN a document here (doc_id rides every row), so
      // array_distinct on the per-doc window array replaces a
      // full-corpus distinct — removing the shuffle+dedup of every
      // (doc, window-string) row (guide §2.4); the groupBy below is
      // then the only corpus exchange. Same rows by construction.
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.GraftFunctions.wordNGrams(
          spark, TextOps.words(col("text")), 8))).as("win"))
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("win"))

  private val substringOracle =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |w AS (
      |  SELECT DISTINCT doc_id,
      |    array_to_string(list_slice(ws, st + 1, st + 8), ' ') AS win
      |  FROM d, unnest(generate_series(0, n - 8, 1)) AS t(st))
      |SELECT win, count(*) AS n_docs,
      |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
      |FROM w GROUP BY win HAVING count(*) >= 2 ORDER BY win""".stripMargin

  /** Inter-document repetition pruning (the doc-level decision built
    * on [[substringDedup]]'s shared-window structure — the
    * MassiveText/RefinedWeb-style "drop documents whose content is
    * mostly duplicated elsewhere" filter): for each document, the
    * fraction of its DISTINCT 8-gram windows that also occur in at
    * least one OTHER document; a document is dropped when more than
    * half its windows are shared (`2·n_shared > n_win`, kept as exact
    * integer arithmetic so the decision is bit-identical cross-engine
    * — no float threshold).
    *
    * Scale shape (100 TB): same cost class as the inverted-index
    * build — one distinct over (doc, window), one groupBy(window)
    * producing per-window doc counts, one join back and a per-doc
    * aggregate. All shuffles carry (id, hash)-sized rows, never text;
    * window doc-frequency skew (boilerplate n-grams) pre-aggregates
    * map-side in the count. Documents shorter than the window size
    * have no windows and are kept (LEFT join + coalesce — they carry
    * no repetition evidence either way).
    */
  def interdocDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // per-doc array_distinct replaces the full-corpus distinct — see
    // substringDedup (round 15): one corpus string-shuffle removed.
    //
    // Round 16 (guide §2.4): the join-back of the exploded window
    // stream to the window-frequency table is GONE. n_shared is
    // derived by complement — n_shared = n_win − n_unique — where
    //  · n_win (a doc's distinct windows) is the SIZE of the per-doc
    //    distinct window array, computed narrowly at the scan with no
    //    shuffle at all (it equals the count the old per-doc aggregate
    //    produced, by construction: the explode emits exactly that
    //    array's elements);
    //  · n_unique (windows owned by exactly one doc) rides in the SAME
    //    groupBy(win) that computed the doc-frequency: a window with
    //    n_docs = 1 has min(doc_id) = its sole owner, so a second
    //    small aggregate keyed by that owner counts them.
    // The old shape exploded the corpus TWICE (the frequency build and
    // the join probe) and re-shuffled every (doc, window-string) row
    // through the join; this explodes once and shuffles window strings
    // once. It is also skew-safe where a postings-list rewrite would
    // not be: boilerplate windows (huge n_docs) are filtered before
    // the second aggregate, never collected.
    val docs = Tables.documents(spark, sfDir)
    val wins = array_distinct(graft.functions.GraftFunctions.wordNGrams(
      spark, TextOps.words(col("text")), 8))
    val uniq = docs
      .select(col("doc_id"), explode(wins).as("win"))
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("owner"))
      .filter(col("n_docs") === 1)
      .groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    docs.select(col("doc_id"),
        coalesce(size(wins).cast("long"), lit(0L)).as("n_win"))
      .join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_win"),
        (col("n_win") - coalesce(col("n_unique"), lit(0L))).as("n_shared"))
      .withColumn("shared_frac",
        when(col("n_win") > 0,
          round(col("n_shared").cast("double") / col("n_win"), 4))
          .otherwise(lit(0.0)))
      .withColumn("keep", col("n_shared") * 2 <= col("n_win"))
      .orderBy(col("doc_id"))
  }

  private val interdocOracle =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |w AS (
      |  SELECT DISTINCT doc_id,
      |    array_to_string(list_slice(ws, st + 1, st + 8), ' ') AS win
      |  FROM d, unnest(generate_series(0, n - 8, 1)) AS t(st)),
      |f AS (SELECT win, count(*) AS n_docs FROM w GROUP BY win),
      |p AS (
      |  SELECT w.doc_id, count(*) AS n_win,
      |    CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_shared
      |  FROM w JOIN f USING (win) GROUP BY w.doc_id)
      |SELECT d.doc_id,
      |  coalesce(p.n_win, 0) AS n_win,
      |  coalesce(p.n_shared, 0) AS n_shared,
      |  CASE WHEN coalesce(p.n_win, 0) > 0
      |    THEN round(CAST(p.n_shared AS DOUBLE) / p.n_win, 4)
      |    ELSE 0.0 END AS shared_frac,
      |  coalesce(p.n_shared, 0) * 2 <= coalesce(p.n_win, 0) AS keep
      |FROM d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // ---- SemDeDup: cluster-bucketed semantic dedup ----------------------

  private val SEM_NC = 16
  private val SEM_EPS = 0.35

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): cluster the
    * embedding space with a coarse k-means quantizer, then search for
    * semantic duplicates ONLY within each cluster — pairwise work
    * drops from O(n²) to O(Σ|cell|²), and the pair search becomes an
    * EQUI-join on the cluster id (shuffle-partitioned by cell at
    * 100 TB; no corpus broadcast, no nested loop). Within a duplicate
    * group the paper keeps the member with the LOWEST cosine to the
    * cluster centroid (the "edge" point carries the most information);
    * here: a doc is removed iff some same-cluster neighbor with
    * cosine ≥ ε is strictly closer to the centroid (ties → lower id
    * survives). Centroids are TRAINED in-engine (round 6):
    * [[graft.operators.Quantizer.trainedCentroids]] runs Lloyd
    * iterations from the deterministic first-NC seed, and the oracle
    * replays the same training with exact arithmetic
    * ([[graft.operators.Quantizer.trainedCentroidsSql]]), so the
    * trained assignment and the whole decision stay hash-checked.
    */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cent = graft.operators.Quantizer.trainedCentroids(spark, e, SEM_NC)
    Dedup.semanticDedup(spark, e, cent, SEM_EPS)
      .select(col("c_id"), col("vec_id"), round(col("c_cos"), 6).as("centroid_cos"))
      .orderBy(col("c_id"), col("vec_id"))
  }

  private val semanticOracle =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |${graft.operators.Quantizer.trainedCentroidsSql(SEM_NC)},
       |assigned AS (
       |  SELECT vec_id, emb, nrm, c_id, c_cos FROM (
       |    SELECT n.vec_id, n.emb, n.nrm, cent.c_id,
       |      list_dot_product(n.emb, cent.c_emb)/(n.nrm*cent.c_nrm) AS c_cos,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.emb, cent.c_emb)/(n.nrm*cent.c_nrm) DESC, cent.c_id) AS rk
       |    FROM n, cent) WHERE rk = 1)
       |SELECT c_id, vec_id, round(c_cos, 6) AS centroid_cos FROM (
       |  SELECT DISTINCT a.c_id, a.vec_id, a.c_cos
       |  FROM assigned a JOIN assigned o
       |    ON a.c_id = o.c_id AND a.vec_id <> o.vec_id
       |  WHERE list_dot_product(a.emb, o.emb)/(a.nrm*o.nrm) >= $SEM_EPS
       |    AND (o.c_cos < a.c_cos OR (o.c_cos = a.c_cos AND o.vec_id < a.vec_id)))
       |ORDER BY c_id, vec_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("dedup_exact", Some(exactOracle), exact),
    Q("dedup_incremental", Some(incrementalOracle), incremental),
    Q("dedup_substring", Some(substringOracle), substringDedup),
    Q("dedup_interdoc", Some(interdocOracle), interdocDedup),
    Q("dedup_jaccard_pairs", Some(jaccardPairsSql), jaccardPairs),
    Q("dedup_minhash_lsh", Some(jaccardPairsSql), minhashLsh),
    Q("dedup_clusters", Some(clustersOracle), clusters),
    Q("dedup_clusters_star", Some(clustersOracle), clustersStar),
    Q("dedup_keep_best", Some(keepBestOracle), keepBest),
    Q("dedup_simhash", Some(simhashOracle), simhashPairs),
    Q("dedup_embedding_cosine", Some(embeddingCosineOracle), embeddingCosine),
    Q("dedup_semantic", Some(semanticOracle), semanticDedup),
  )
}
