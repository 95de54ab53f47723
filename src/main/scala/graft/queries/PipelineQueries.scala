package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** Training-data curation operators beyond dedup/similarity: the
  * pipeline stages that sit between "raw corpus" and "training mix".
  *
  * Scale notes (100 TB):
  *  - [[sampleStratified]] is a pure narrow filter (hash-mod on a
  *    per-row key) — zero shuffles, trivially parallel, and the SAME
  *    rows are kept on any cluster size or rerun (md5-derived
  *    membership, no RNG state).
  *  - [[packSequences]] windows WITHIN a partition key (language here,
  *    a shard key in production) — running sums never cross the key,
  *    so the window is a per-key sort, not a global one.
  *  - [[mergeUpsert]] is one shuffle on the merge key (the standard
  *    CDC upsert shape: union + row_number, latest version wins).
  *  - [[embCentroids]] is one partial+final aggregation over
  *    (cell, dim) — the k-means update step as a groupBy, no
  *    driver-side math.
  */
object PipelineQueries {

  // ---- stratified sampling --------------------------------------------

  /** Deterministic stratified sampling with per-language quotas:
    * membership = `h60("samp_" || doc_id) % 100 < rate(lang)`.
    * Hash-derived (not RNG) ⇒ reproducible across engines, reruns and
    * cluster sizes — the property a training-data mix needs for
    * auditability. Rates: en 60%, others 25%.
    */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val rate = when(col("lang") === "en", 60).otherwise(25)
    Tables.documents(spark, sfDir)
      .withColumn("bucket",
        TextOps.h60(concat(lit("samp_"), col("doc_id").cast("string"))) % 100)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val sampleOracle =
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE ${TextOps.h60Sql("('samp_' || CAST(doc_id AS VARCHAR))")} % 100
       |  < (CASE WHEN lang = 'en' THEN 60 ELSE 25 END)
       |ORDER BY doc_id""".stripMargin

  /** Consistent (coordinated) bottom-k sample: the k documents with
    * the smallest content-id hashes. Unlike rate-based membership
    * ([[sampleStratified]]), bottom-k yields an EXACTLY-k uniform
    * sample that is a pure function of the ids — identical across
    * engines, reruns, partitionings and cluster sizes, and MERGEABLE:
    * bottom-k of a union = bottom-k of the per-shard bottom-ks, so a
    * 1000-executor corpus samples with O(k) state per partition and
    * one O(k)-row final merge (TakeOrdered — the same plan top-N
    * uses). This is the sampling twin of the KMV distinct sketch
    * (`approx_distinct_kmv`): same bottom-k state, read as a sample
    * rather than as a cardinality estimator. The rank column makes
    * prefix-subsampling free: rows with rank <= j are exactly the
    * bottom-j sample — nested samples for scaling-law ladders.
    */
  def sampleBottomK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        TextOps.h60(concat(lit("bk_"), col("doc_id").cast("string"))).as("hv"))
      .orderBy(col("hv"), col("doc_id"))
      .limit(100)
      .withColumn("rank", row_number().over(Window.orderBy(col("hv"), col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lang"), col("source"), col("hv"))
  }

  private val bottomkOracle =
    s"""WITH h AS (
       |  SELECT doc_id, lang, source,
       |    ${TextOps.h60Sql("('bk_' || CAST(doc_id AS VARCHAR))")} AS hv
       |  FROM documents),
       |bk AS (SELECT * FROM h ORDER BY hv, doc_id LIMIT 100)
       |SELECT row_number() OVER (ORDER BY hv, doc_id) AS rank,
       |  doc_id, lang, source, hv
       |FROM bk ORDER BY rank""".stripMargin

  /** Temperature-style source rebalancing: each source is kept at
    * rate `min(1, K/sqrt(count))` — big sources are downsampled
    * toward sqrt-proportional mass (the T5/data-mixing move), small
    * sources pass through. Rates are DATA-DEPENDENT (computed from
    * the per-source counts in the same job, broadcast back), unlike
    * [[sampleStratified]]'s static quotas. Membership stays
    * hash-derived and exact: `h60 < floor(rate · 2^60)` — sqrt and
    * the /,· are IEEE-correctly-rounded in both engines, and scaling
    * by 2^60 is an exponent shift, so the threshold is bit-identical
    * cross-engine. At 100 TB: one partial+final count, a broadcast
    * of #sources rows, one narrow filter pass.
    */
  def mixTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val two60 = 1152921504606846976.0 // 2^60, exact double
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val thr = floor(least(lit(1.0),
      lit(3.0) / sqrt(col("n_docs").cast("double"))) * two60).cast("long")
    val keep = (TextOps.h60(concat(lit("mix_"), col("doc_id").cast("string")))
      < thr).cast("long")
    docs.join(broadcast(counts), "source")
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"), sum(keep).as("n_kept"))
      .withColumn("achieved_rate",
        round(col("n_kept").cast("double") / col("n_docs"), 4))
      .orderBy(col("source"))
  }

  private val mixOracle =
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       |k AS (
       |  SELECT d.source, c.n_docs,
       |    CASE WHEN ${TextOps.h60Sql("('mix_' || CAST(d.doc_id AS VARCHAR))")}
       |      < CAST(floor(least(1.0, 3.0/sqrt(CAST(c.n_docs AS DOUBLE)))
       |          * 1152921504606846976.0) AS BIGINT)
       |    THEN 1 ELSE 0 END AS keep
       |  FROM documents d JOIN c USING (source))
       |SELECT source, max(n_docs) AS n_docs,
       |  CAST(sum(keep) AS BIGINT) AS n_kept,
       |  round(CAST(sum(keep) AS DOUBLE) / max(n_docs), 4) AS achieved_rate
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** Per-domain quota (the hard-cap companion to [[mixTemperature]]'s
    * rate-based rebalancing): no domain may contribute more than
    * `floor(0.15 · corpus)` documents — the CommonCrawl-curation move
    * that stops one giant domain from dominating the mix. `lang` plays
    * the domain role in the synthetic schema (it is the skewed key;
    * `source` is uniform). Selection within an over-cap domain is an
    * exact top-`cap` by deterministic content-independent hash rank
    * (`h60`, doc_id tie-break) — a reproducible lottery, not "first
    * cap rows seen".
    *
    * Scale shape (100 TB): the cap and per-domain counts are one
    * count aggregate broadcast back (#domains rows). The ranking
    * window — the only sort — runs ONLY over rows of over-cap
    * domains; under-cap domains (the long tail, the vast majority of
    * rows under a Zipfian domain distribution) pass through on a
    * broadcast semi-join with no sort at all. A single global window
    * over every domain would sort the full corpus to discard almost
    * no rows.
    */
  def domainCap(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val cap = counts.agg(
      floor(sum(col("n_docs")).cast("double") * 0.15).cast("long").as("cap"))
    val withCap = counts.crossJoin(broadcast(cap))
    val ranked = docs
      .join(broadcast(withCap.filter(col("n_docs") > col("cap"))
        .select(col("lang"), col("cap"))), "lang")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(
          TextOps.h60(concat(lit("cap_"), col("doc_id").cast("string"))),
          col("doc_id"))))
      .filter(col("rk") <= col("cap"))
      .select(col("doc_id"), col("lang"))
    val pass = docs
      .join(broadcast(withCap.filter(col("n_docs") <= col("cap"))
        .select(col("lang"))), "lang")
      .select(col("doc_id"), col("lang"))
    ranked.unionByName(pass).orderBy(col("doc_id"))
  }

  private val domainCapOracle =
    s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |cap AS (SELECT CAST(floor(CAST(sum(n_docs) AS DOUBLE) * 0.15) AS BIGINT)
       |          AS cap FROM c),
       |r AS (
       |  SELECT d.doc_id, d.lang, c.n_docs, cap.cap,
       |    row_number() OVER (PARTITION BY d.lang
       |      ORDER BY ${TextOps.h60Sql("('cap_' || CAST(d.doc_id AS VARCHAR))")},
       |        d.doc_id) AS rk
       |  FROM documents d JOIN c USING (lang), cap)
       |SELECT doc_id, lang FROM r
       |WHERE n_docs <= cap OR rk <= cap ORDER BY doc_id""".stripMargin

  // ---- sequence packing -----------------------------------------------

  private val PackBudget = 2048

  /** Sequence packing: assign documents (in deterministic doc_id
    * order, per language) to fixed token-budget bins — the
    * context-window packing step of a training pipeline. A document
    * starts in the bin its running predecessor-token-count falls in
    * (`floor(tokens_before / budget)`), so bin assignment is a window
    * running sum + arithmetic: no pairwise bin-fitting loop, and the
    * window never crosses the partition key.
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = size(TextOps.words(col("text")))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"), toks.as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0)))
      .withColumn("bin_id", floor(col("tokens_before") / PackBudget))
      .groupBy(col("lang"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy(col("lang"), col("bin_id"))
  }

  private val packOracle =
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (
       |  SELECT lang, doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
       |  FROM t)
       |SELECT lang, CAST(floor(tokens_before / $PackBudget) AS BIGINT) AS bin_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |FROM b GROUP BY lang, bin_id ORDER BY lang, bin_id""".stripMargin

  // ---- snapshot merge / upsert ----------------------------------------

  /** CDC-style upsert: a delta snapshot (every 7th doc re-crawled with
    * appended content) merged into the base corpus, latest version
    * winning. One shuffle on the merge key via the deterministic
    * row_number form — the incremental-refresh operator a recurring
    * crawl pipeline needs (the reference re-scrapes everything each
    * run).
    */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), lit(1).as("version"))
    val delta = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" updated v2")).as("text"),
        lit(2).as("version"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("version").desc)
    base.unionByName(delta)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("version"), length(col("text")).as("n_chars_final"))
      .orderBy(col("doc_id"))
  }

  private val mergeOracle =
    """WITH merged AS (
      |  SELECT doc_id, text, 1 AS version FROM documents
      |  UNION ALL
      |  SELECT doc_id, text || ' updated v2', 2 FROM documents WHERE doc_id % 7 = 0),
      |r AS (
      |  SELECT doc_id, version, text,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
      |  FROM merged)
      |SELECT doc_id, version, CAST(length(text) AS INT) AS n_chars_final
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---- embedding centroids (k-means update step) -----------------------

  private val NC = 16 // coarse cells (same quantizer as sim_ann_ivf)

  /** Per-cell embedding centroids — the UPDATE step of a k-means /
    * IVF-training iteration, as one aggregation: assign each vector to
    * its nearest seed centroid (cosine, deterministic tie-break), then
    * average per (cell, dimension).
    *
    * Cross-engine exactness: each component is quantized to an integer
    * (`floor(x·1000)` — float→double widening, one IEEE multiply and
    * floor are bit-identical in both engines), summed exactly as
    * longs, and the final centroid is ONE double division of exact
    * integers — no summation-order or rounding hazard anywhere.
    */
  def embCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cent = e.filter(col("vec_id") < NC)
      .select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
    // slim max_by assignment (see Quantizer.assignNearest): the
    // aggregate never carries the embedding; it rejoins after
    val assigned = graft.operators.Quantizer.assignNearest(spark, e, cent)
      .select(col("vec_id"), col("emb"), col("c_id"))
    assigned
      .select(col("c_id"), posexplode(col("emb")).as(Seq("pos", "v")))
      .select(col("c_id"), (col("pos") + 1).as("dim"),
        floor(col("v") * 1000).as("q"))
      .groupBy(col("c_id"), col("dim"))
      .agg(count(lit(1)).as("n_members"), sum(col("q")).as("sum_q"))
      .withColumn("centroid", col("sum_q").cast("double") / (col("n_members") * 1000.0))
      .select(col("c_id"), col("dim"), col("n_members"), col("centroid"))
      .orderBy(col("c_id"), col("dim"))
  }

  private val centroidsOracle =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < $NC),
       |assigned AS (
       |  SELECT vec_id, emb, c_id FROM (
       |    SELECT n.vec_id, n.emb, cent.c_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.emb, cent.c_emb)/(n.nrm*cent.c_nrm) DESC, cent.c_id) AS rk
       |    FROM n, cent) WHERE rk = 1),
       |q AS (
       |  SELECT c_id, d.dim, CAST(floor(emb[d.dim] * 1000) AS BIGINT) AS q
       |  FROM assigned, generate_series(1, 64) AS d(dim))
       |SELECT c_id, CAST(dim AS INT) AS dim, count(*) AS n_members,
       |  CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / (count(*) * 1000.0) AS centroid
       |FROM q GROUP BY c_id, dim ORDER BY c_id, dim""".stripMargin

  // ---- int8 embedding quantization --------------------------------------

  /** Symmetric int8 quantization of each embedding (the storage/ANN
    * compression step): q = floor(v / maxabs(vec) * 127). Per-vector
    * state only — posexplode + a partition-window max + one
    * re-aggregation; no cross-vector communication, so it scales as a
    * single shuffle on vec_id. floor (not round) keeps the cross-engine
    * comparison exact: identical IEEE doubles in, identical ints out.
    * Reported as per-vector code statistics (sum/min/max), which pin
    * every code's value through the oracle hash.
    */
  def embQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .withColumn("maxabs", max(abs(col("v"))).over(w))
      .select(col("vec_id"),
        when(col("maxabs") > 0, floor(col("v") / col("maxabs") * 127))
          .otherwise(lit(0L)).cast("int").as("q"))
      .groupBy(col("vec_id"))
      .agg(sum(col("q")).as("q_sum"), min(col("q")).as("q_min"),
        max(col("q")).as("q_max"), count(lit(1)).as("dims"))
      .orderBy(col("vec_id"))
  }

  private val quantizeOracle =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings),
      |x AS (SELECT vec_id, unnest(emb) AS v FROM e),
      |m AS (SELECT vec_id, v, max(abs(v)) OVER (PARTITION BY vec_id) AS maxabs FROM x),
      |q AS (SELECT vec_id,
      |  CASE WHEN maxabs > 0 THEN CAST(floor(v/maxabs*127) AS INT) ELSE 0 END AS q
      |  FROM m)
      |SELECT vec_id, CAST(sum(q) AS BIGINT) AS q_sum, min(q) AS q_min,
      |  max(q) AS q_max, count(*) AS dims
      |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- train/val/test split ---------------------------------------------

  /** Deterministic train/val/test split (80/10/10) by hashed doc_id —
    * the split must be a pure function of the document identity so it
    * survives recrawls, reshards and engine swaps (no RNG state, no
    * ordering dependence). Reported as per-split corpus statistics.
    * At 100 TB this is a narrow map + one tiny aggregation.
    */
  def sampleSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = TextOps.h60(concat(lit("split_"), col("doc_id").cast("string"))) % 10
    val split = when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
    Tables.documents(spark, sfDir)
      .select(split.as("split"), col("n_chars"), col("lang"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_total"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))
  }

  private val splitOracle = {
    val bucket = s"${TextOps.h60Sql("('split_' || CAST(doc_id AS VARCHAR))")} % 10"
    s"""SELECT CASE WHEN $bucket < 8 THEN 'train'
       |            WHEN $bucket = 8 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_total,
       |  count(DISTINCT lang) AS n_langs
       |FROM documents GROUP BY split ORDER BY split""".stripMargin
  }

  // ---- benchmark contamination check ------------------------------------

  /** Benchmark-contamination scan: which training documents share ≥ 3
    * distinct word-5-grams with a held-out benchmark set (every 29th
    * doc)? The canonical eval-integrity check before a training run.
    * Shape at 100 TB: the benchmark n-gram index is SMALL (benchmarks
    * are thousands of docs, not billions) — broadcast it; the corpus
    * side explodes to (doc, 5-gram-hash) and hash-joins, so the scan
    * is one pass, no shuffle of the corpus, and the per-pair distinct
    * count is a partial-aggregated groupBy on matches only.
    */
  def contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val isBench = col("doc_id") % 29 === 0
    def grams(df: DataFrame, idAs: String) = df
      .select(col("doc_id").as(idAs),
        explode(array_distinct(graft.functions.GraftFunctions.wordNGrams(
          spark, TextOps.words(col("text")), 5))).as("g"))
      .select(col(idAs), TextOps.h60(col("g")).as("h"))
    val docs = Tables.documents(spark, sfDir)
    val bench = grams(docs.filter(isBench), "bench_id")
    val train = grams(docs.filter(!isBench), "train_id")
    train.join(broadcast(bench), "h")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .orderBy(col("train_id"), col("bench_id"))
  }

  private val contaminationOracle = {
    val g5 = TextOps.ngramsDistinctSql("string_split(text, ' ')", 5)
    s"""WITH g AS (
       |  SELECT doc_id, ${TextOps.h60Sql("g.g")} AS h
       |  FROM (SELECT doc_id, unnest($g5) AS g FROM documents) g),
       |bench AS (SELECT doc_id AS bench_id, h FROM g WHERE doc_id % 29 = 0),
       |train AS (SELECT doc_id AS train_id, h FROM g WHERE doc_id % 29 <> 0)
       |SELECT train_id, bench_id, count(*) AS n_shared
       |FROM train JOIN bench USING (h)
       |GROUP BY train_id, bench_id
       |HAVING count(*) >= 3
       |ORDER BY train_id, bench_id""".stripMargin
  }

  /** One-pass column profiler — the data-QA summary (null counts,
    * distinct cardinalities, value bounds) a pipeline runs before
    * trusting a new corpus drop. ALL statistics compute in a single
    * aggregation over one scan (then a constant-width unpivot), not a
    * query per column: at 100 TB the scan is the cost and it's paid
    * once. The reference's equivalent is pandas `.info()` eyeballing;
    * this is the engine-native, shuffle-once form.
    */
  def profileColumns(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val row = d.agg(
      count(lit(1)).as("n_rows"),
      count(col("lang")).as("lang_nonnull"),
      count_distinct(col("lang")).as("lang_distinct"),
      count(col("source")).as("source_nonnull"),
      count_distinct(col("source")).as("source_distinct"),
      count(col("text")).as("text_nonnull"),
      count_distinct(col("text")).as("text_distinct"),
      min(col("n_chars")).as("chars_min"),
      max(col("n_chars")).as("chars_max"))
    row.select(col("n_rows"), expr(
      """stack(3,
        |  'lang',   lang_nonnull,   lang_distinct,
        |  'source', source_nonnull, source_distinct,
        |  'text',   text_nonnull,   text_distinct
        |) AS (col_name, n_nonnull, n_distinct)""".stripMargin),
      col("chars_min"), col("chars_max"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("chars_min"), col("chars_max"))
      .orderBy(col("col_name"))
  }

  private val profileOracle =
    """WITH s AS (
      |  SELECT count(*) AS n_rows,
      |    count(lang) AS lang_nonnull, count(DISTINCT lang) AS lang_distinct,
      |    count(source) AS source_nonnull, count(DISTINCT source) AS source_distinct,
      |    count(text) AS text_nonnull, count(DISTINCT text) AS text_distinct,
      |    min(n_chars) AS chars_min, max(n_chars) AS chars_max
      |  FROM documents)
      |SELECT v.col_name, s.n_rows, v.n_nonnull, v.n_distinct,
      |  s.chars_min, s.chars_max
      |FROM s, LATERAL (VALUES
      |  ('lang', lang_nonnull, lang_distinct),
      |  ('source', source_nonnull, source_distinct),
      |  ('text', text_nonnull, text_distinct)) AS v(col_name, n_nonnull, n_distinct)
      |ORDER BY v.col_name""".stripMargin

  /** Equi-width histogram of a numeric column (`width_bucket`, 20 bins
    * over the observed [min,max]) — the distribution profile every
    * curation decision starts from. Two passes: a 1-row min/max
    * aggregate broadcast back (same shape as the text scorers), then a
    * codegen'd bucket-assign + count. At 100 TB both passes are
    * scan-bound; the histogram itself is 20 rows regardless of input.
    */
  def aggHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_extendedprice").as("x"))
    val bounds = li.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    // bucket computed arithmetically (not width_bucket — DuckDB lacks
    // it): identical IEEE tree on both engines → identical buckets.
    // Degenerate single-value column (hi == lo) → everything in bucket
    // 1 instead of a 0/0 division.
    val bucket = when(col("hi") === col("lo"), lit(1L)).otherwise(least(
      floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 20) + 1, lit(20L)))
    li.crossJoin(broadcast(bounds))
      .select(bucket.as("bucket"), col("lo"), col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(first(col("lo")) + (col("bucket") - 1) * (first(col("hi")) - first(col("lo"))) / 20.0, 4)
          .as("bucket_lo"))
      .select(col("bucket").cast("int").as("bucket"), col("n"), col("bucket_lo"))
      .orderBy(col("bucket"))
  }

  private val histogramOracle =
    """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      |  FROM lineitem),
      |x AS (
      |  SELECT CASE WHEN hi = lo THEN 1
      |    ELSE least(floor((l_extendedprice - lo) / (hi - lo) * 20) + 1, 20) END AS bucket,
      |    lo, hi
      |  FROM lineitem, b)
      |SELECT CAST(bucket AS INT) AS bucket, count(*) AS n,
      |  round(min(lo) + (bucket - 1) * (min(hi) - min(lo)) / 20.0, 4) AS bucket_lo
      |FROM x GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Snapshot diff (the read side of CDC, `merge_upsert`'s sibling):
    * two deterministic snapshots of orders — "yesterday" (orderdate
    * before the cutoff) vs "today" (everything, with totals bumped for
    * a deterministic subset) — full-outer-joined on the key and
    * classified added / removed / changed / unchanged. One shuffle on
    * the join key; at 100 TB this is the standard reconciliation scan,
    * and the classification never leaves the joined row.
    */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val old = orders
      .filter(col("o_orderdate") < lit("1997-01-01").cast("date"))
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v_old"))
    val nw = orders
      .select(col("o_orderkey").as("k"),
        // +1.5 (binary-exact constant): the bump must not involve a
        // round() on a product, whose .005 midpoints diverge between
        // BigDecimal-repr and binary rounding across engines
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.5)
          .otherwise(col("o_totalprice")).as("v_new"))
    old.join(nw, Seq("k"), "full_outer")
      .select(
        when(col("v_old").isNull, lit("added"))
          .when(col("v_new").isNull, lit("removed"))
          .when(col("v_old") =!= col("v_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("change"))
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
      .orderBy(col("change"))
  }

  private val snapshotDiffOracle =
    """WITH old AS (
      |  SELECT o_orderkey AS k, o_totalprice AS v_old FROM orders
      |  WHERE o_orderdate < DATE '1997-01-01'),
      |nw AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.5
      |         ELSE o_totalprice END AS v_new
      |  FROM orders)
      |SELECT CASE WHEN v_old IS NULL THEN 'added'
      |            WHEN v_new IS NULL THEN 'removed'
      |            WHEN v_old <> v_new THEN 'changed'
      |            ELSE 'unchanged' END AS change, count(*) AS n
      |FROM old FULL OUTER JOIN nw USING (k)
      |GROUP BY 1 ORDER BY change""".stripMargin

  /** Rule-based data-quality expectations: each rule is a codegen'd
    * predicate; one pass computes per-rule violation counts + rates —
    * the batch form of `observe()` metrics (ObservabilitySpec) as an
    * oracle-checked query. At 100 TB: one scan, one 4-row result,
    * no shuffle beyond the final tiny aggregate.
    */
  def dqExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val rules = Seq(
      ("quantity_positive", col("l_quantity") > 0),
      ("price_nonnegative", col("l_extendedprice") >= 0),
      ("quantity_at_most_30", col("l_quantity") <= 30), // fires: quantities run higher

      ("shipdate_present", col("l_shipdate").isNotNull))
    val aggs = rules.map { case (name, pred) =>
      sum(when(!pred, 1).otherwise(0)).as(name)
    }
    val total = count(lit(1)).as("n_rows")
    li.agg(aggs.head, aggs.tail :+ total: _*)
      .selectExpr("stack(4, " + rules.map { case (n, _) => s"'$n', $n" }
        .mkString(", ") + ") AS (rule, violations)", "n_rows")
      .select(col("rule"), col("violations"),
        graft.operators.Enrich.roundDiv4(col("violations"), col("n_rows"))
          .as("violation_rate"))
      .orderBy(col("rule"))
  }

  private val dqOracle =
    s"""WITH a AS (
      |  SELECT count(*) AS n_rows,
      |    sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS quantity_positive,
      |    sum(CASE WHEN NOT (l_extendedprice >= 0) THEN 1 ELSE 0 END) AS price_nonnegative,
      |    sum(CASE WHEN NOT (l_quantity <= 30) THEN 1 ELSE 0 END) AS quantity_at_most_30,
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS shipdate_present
      |  FROM lineitem),
      |r AS (
      |  SELECT 'quantity_positive' AS rule, quantity_positive AS violations, n_rows FROM a
      |  UNION ALL SELECT 'price_nonnegative', price_nonnegative, n_rows FROM a
      |  UNION ALL SELECT 'quantity_at_most_30', quantity_at_most_30, n_rows FROM a
      |  UNION ALL SELECT 'shipdate_present', shipdate_present, n_rows FROM a)
      |SELECT rule, CAST(violations AS BIGINT) AS violations,
      |  ${graft.operators.Enrich.roundDiv4Sql("violations", "n_rows")} AS violation_rate
      |FROM r ORDER BY rule""".stripMargin

  /** Corpus composition report — the first query any training-mix
    * owner runs: per (source, lang) cell, document count, whitespace
    * tokens, characters, and each cell's share of total tokens. One
    * narrow pass + one tiny groupBy; the global total re-joins via a
    * broadcast 1-row aggregate. Shares use exact integer rounding so
    * the report hash-matches.
    */
  def mixReport(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("source"), col("lang"),
        size(TextOps.words(col("text"))).cast("long").as("toks"), col("n_chars"))
    val cells = perDoc.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("n_tokens"),
        sum(col("n_chars")).cast("long").as("n_chars"))
    val total = cells.agg(sum(col("n_tokens")).cast("long").as("tot"))
    cells.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_chars"),
        graft.operators.Enrich.roundDiv4(col("n_tokens"), col("tot"))
          .as("token_share"))
      .orderBy(col("source"), col("lang"))
  }

  private val mixReportOracle = {
    val share = graft.operators.Enrich.roundDiv4Sql("n_tokens", "tot")
    s"""WITH c AS (
      |  SELECT source, lang, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |    CAST(sum(n_chars) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY source, lang),
      |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM c)
      |SELECT source, lang, n_docs, n_tokens, n_chars, $share AS token_share
      |FROM c, t ORDER BY source, lang""".stripMargin
  }

  // ---- DSIR: importance resampling for data selection ------------------

  private val DSIR_NB = 1024 // hashed feature buckets
  private val DSIR_N = 100 // selected documents

  /** DSIR data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed n-gram distribution is —
    * `log w(x) = Σ_b n_b(x)·(ln p_target(b) − ln p_raw(b))` over
    * [[DSIR_NB]] hashed word buckets with +1 smoothing — and keep the
    * top-[[DSIR_N]] (the paper's deterministic top-k variant; its
    * Gumbel-noise resampling adds RNG on top of the same weights).
    * Target here: the `lang='en'` slice of the same corpus, standing
    * in for the real small clean target corpus.
    *
    * 100 TB shape: features never materialize per word — one hashed
    * bucket histogram per side (≤ NB rows each, broadcast back), one
    * per-doc (doc, bucket) aggregate, scoring via broadcast join, and
    * the selection is TakeOrdered (sort+limit), never a global sort.
    * Cross-engine exactness: each `ln` quantizes to decimal(20,12)
    * BEFORE the subtraction (the `text_lm_score` pattern), so the
    * per-doc sum is exact decimal arithmetic with no
    * float-summation-order hazard; ranking ties break on doc_id.
    */
  def dsirSelect(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = graft.operators.Selection.dsirLogWeights(
      Tables.documents(spark, sfDir),
      col("doc_id"), col("text"), col("lang") === "en", DSIR_NB)
    scored.orderBy(col("logw").desc, col("doc_id")).limit(DSIR_N)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("logw").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"),
        round(col("logw").cast("double"), 6).as("importance"))
      .orderBy(col("rank"))
  }

  private val dsirOracle =
    s"""WITH f AS (
       |  SELECT doc_id, lang, (${TextOps.h31Sql("word")} % $DSIR_NB) AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
       |        FROM documents)),
       |pd AS (
       |  SELECT doc_id, lang, b, CAST(count(*) AS DECIMAL(10,0)) AS n
       |  FROM f GROUP BY doc_id, lang, b),
       |raw AS (SELECT b, CAST(sum(n) AS BIGINT) AS cr FROM pd GROUP BY b),
       |tgt AS (SELECT b, CAST(sum(n) AS BIGINT) AS ct FROM pd
       |        WHERE lang = 'en' GROUP BY b),
       |hist AS (
       |  SELECT raw.b, cr, COALESCE(ct, 0) AS ct
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
       |tots AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
       |                CAST(sum(ct) AS BIGINT) AS tt FROM hist),
       |lw AS (
       |  SELECT b,
       |    CAST(ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + $DSIR_NB AS DOUBLE)) AS DECIMAL(20,12))
       |  - CAST(ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + $DSIR_NB AS DOUBLE)) AS DECIMAL(20,12)) AS dlw
       |  FROM hist, tots),
       |s AS (SELECT doc_id, sum(n * dlw) AS logw
       |      FROM pd JOIN lw USING (b) GROUP BY doc_id),
       |r AS (SELECT doc_id, logw,
       |        row_number() OVER (ORDER BY logw DESC, doc_id) AS rank FROM s)
       |SELECT rank, doc_id, round(CAST(logw AS DOUBLE), 6) AS importance
       |FROM r WHERE rank <= $DSIR_N ORDER BY rank""".stripMargin

  // ---- in-engine quality classifier (logistic regression) -------------

  private val QC_NB = 4096 // hashed feature buckets
  private val QC_ITERS = 8 // full-batch gradient steps

  /** Quality classifier trained IN the engine: the GPT-3/CCNet
    * curation pattern (Brown et al. 2020 §2.2 — a linear classifier
    * separating target-like from raw text, its score used to filter
    * the crawl) as pure DataFrame aggregates — no MLlib, no driver
    * math. Logistic regression over hashed word buckets, weak label
    * y = (lang='en'), [[QC_ITERS]] full-batch gradient steps, then the
    * whole corpus scored with the learned weights.
    *
    * Every training step is EXACT integer arithmetic, so the oracle
    * replays it bit-identically: residuals quantize to 1e-5 longs
    * (`floor((y−σ)·10⁵)`), weights live in 1e-9-unit longs, and the
    * learning rate 1e-4 makes the weight update `w += Σ n·resid`
    * with NO division (1e-5 · 1e-4 = the 1e-9 weight unit). The only
    * floats are the sigmoid evaluations, each immediately floor-
    * quantized — the `ln`-quantization pattern of `text_lm_score`
    * applied to `exp`. The 1e-5 grid (round 6; was 1e-6) adds floor-
    * boundary headroom: the gate flips only if the engines' `exp`
    * disagree by more than the residual's distance to an integer
    * boundary — measured min 1.4e-7 grid-units (= 1.4e-12 in σ, ~6e3
    * ulps) across all 8 iterations at sf0.01/sf0.1, vs 1-ulp exp
    * noise of ~2e-16. Saturated docs (σ ≈ 5e-17, so y−σ rounds to
    * exactly 1.0 in BOTH engines — ~1e14 ulps from the 2⁻⁵⁴ rounding
    * boundary) sit exactly ON an integer by construction; that case
    * is deterministic, not marginal.
    *
    * 100 TB shape per step: one broadcast join of the ≤[[QC_NB]]-row
    * weight vector, one per-doc aggregate (the forward pass), one
    * per-bucket aggregate (the gradient) — 2 shuffles per iteration,
    * weights never leave broadcast size. Mini-batching and Gumbel
    * sampling are RNG layers over the same shapes.
    */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    // NOTE (round 15, measured dead end): hash-partitioning this cache
    // by doc_id to make the 9 forward aggregates exchange-free made
    // the query 1.4–2× SLOWER — it forces the per-iteration gradient
    // join into co-partitioned sort-merge (8 sorts of the feature
    // table) where AQE was already BROADCASTING the per-doc resid
    // frame (a no-shuffle, no-sort hash join; at production scale
    // resid grows corpus-sized and AQE flips the same join back to
    // shuffle — the right strategy at each scale, left to AQE).
    // Round 16: the cache is hash-partitioned by doc_id ONCE at build
    // (one extra exchange, paid once) so every iteration below reuses
    // that partitioning instead of exchanging the feature table again
    // — guide §2.4 "two operations keyed the same way share one
    // exchange".
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("lang") === "en").cast("int").as("y"),
        explode(TextOps.words(col("text"))).as("word"))
      .select(col("doc_id"), col("y"), (TextOps.h31(col("word")) % QC_NB).as("b"))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("n"))
      .repartition(col("doc_id"))
      .persist()
    def sigma(xq: Column): Column =
      lit(1.0) / (lit(1.0) + exp(-(xq.cast("double") * lit(1e-9))))
    // Round 16, two structural changes (measured interleaved A/B on a
    // loaded host: 5.69 s → 3.37 s min-of-5, every rep faster):
    //  1. The weight vector lives in a DRIVER-SIDE long array indexed
    //     by bucket. QC_NB is a compile-time CONSTANT (4096 longs =
    //     32 KB), i.e. metadata-scale state — the same class as
    //     Quantizer's ≤1025-row codebook collect — and stays 32 KB at
    //     100 TB. The forward pass reads it from a constant array
    //     literal (codegen'd O(1) element_at), so the per-iteration
    //     broadcast build of w, the broadcast hash join, the broadcast
    //     build of grad, the left-join weight update and the eager
    //     localCheckpoint job are ALL gone; the weight update is a
    //     ≤QC_NB-row gradient collect (bounded by construction:
    //     groupBy(b), b ∈ [0, QC_NB)).
    //  2. The forward pass is a WINDOW over the doc_id partitioning
    //     (xq rides on every feature row), not an aggregate + join
    //     back: each iteration is ONE pass over the cache with ZERO
    //     corpus exchanges (the window reuses the cache's hash(doc_id)
    //     layout; only the ≤QC_NB-row gradient aggregate exchanges).
    //     This sidesteps the round-15 dead end — pre-partitioning by
    //     doc_id forced the gradient JOIN into co-partitioned
    //     sort-merge because the exchange-free join had no AQE stage
    //     boundary left to flip it to broadcast — by not having a join
    //     at all. Per-iteration cost at 100 TB: one in-partition sort
    //     of the cached feature table (the window's required ordering)
    //     vs the former corpus agg exchange + corpus-sized resid join.
    // Arithmetic is unchanged — exact-long weights, the window sum is
    // a sum of longs (order-free), the same σ expression — so the
    // oracle replay is bit-identical (verified at sf0.01 and sf0.1).
    val wArr = new Array[Long](QC_NB)
    def wAt(b: Column): Column =
      element_at(typedlit(wArr.toIndexedSeq), (b + 1).cast("int"))
    val byDoc = Window.partitionBy(col("doc_id"))
    for (_ <- 0 until QC_ITERS) {
      val grad = perDoc
        .withColumn("xq", sum(col("n") * wAt(col("b"))).over(byDoc))
        .select(col("b"), col("n"),
          floor((col("y").cast("double") - sigma(col("xq"))) * 1e5)
            .cast("long").as("rq"))
        .groupBy(col("b")).agg(sum(col("n") * col("rq")).as("gq"))
        .collect()
      grad.foreach(r =>
        wArr(r.getAs[Number]("b").intValue) += r.getAs[Number]("gq").longValue)
    }
    perDoc
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("n") * wAt(col("b"))).as("xq"))
      .select(col("doc_id"), col("y").as("is_en"),
        round(sigma(col("xq")), 6).as("p_target"))
      .orderBy(col("doc_id"))
  }

  /** The oracle UNROLLS the training loop: iteration i's CTEs are
    * generated from the same [[QC_ITERS]] constant the Scala loop
    * uses, so the two can never drift. w0 = 0 ⇒ σ = 0.5 exactly, so
    * the first residual needs no sigmoid — the generator special-cases
    * it the way the arithmetic does anyway.
    */
  private val qcOracle = {
    def sig(x: String) = s"1.0/(1.0 + exp(-(CAST($x AS DOUBLE) * 1e-9)))"
    val iters = (1 to QC_ITERS).map { i =>
      val (prevW, resid) =
        if (i == 1)
          ("", s"""r1 AS (
             |  SELECT doc_id, CAST(floor((y - 0.5) * 100000) AS BIGINT) AS rq
             |  FROM (SELECT DISTINCT doc_id, y FROM pd))""".stripMargin)
        else
          (s"w${i - 1}", s"""x$i AS (
             |  SELECT pd.doc_id, y, CAST(sum(n * wq) AS BIGINT) AS xq
             |  FROM pd JOIN w${i - 1} USING (b) GROUP BY pd.doc_id, y),
             |r$i AS (
             |  SELECT doc_id,
             |    CAST(floor((y - ${sig("xq")}) * 100000) AS BIGINT) AS rq
             |  FROM x$i)""".stripMargin)
      val update =
        if (i == 1)
          s"""w1 AS (
             |  SELECT b, CAST(sum(n * rq) AS BIGINT) AS wq
             |  FROM pd JOIN r1 USING (doc_id) GROUP BY b)""".stripMargin
        else
          s"""g$i AS (
             |  SELECT b, CAST(sum(n * rq) AS BIGINT) AS gq
             |  FROM pd JOIN r$i USING (doc_id) GROUP BY b),
             |w$i AS (
             |  SELECT $prevW.b, wq + COALESCE(gq, 0) AS wq
             |  FROM $prevW LEFT JOIN g$i ON $prevW.b = g$i.b)""".stripMargin
      s"$resid,\n$update"
    }.mkString(",\n")
    s"""WITH f AS (
       |  SELECT doc_id, lang, (${TextOps.h31Sql("word")} % $QC_NB) AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
       |        FROM documents)),
       |pd AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, b,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM f GROUP BY doc_id, y, b),
       |$iters,
       |xf AS (
       |  SELECT pd.doc_id, y, CAST(sum(n * wq) AS BIGINT) AS xq
       |  FROM pd JOIN w$QC_ITERS USING (b) GROUP BY pd.doc_id, y)
       |SELECT doc_id, y AS is_en, round(${sig("xq")}, 6) AS p_target
       |FROM xf ORDER BY doc_id""".stripMargin
  }

  // ---- streaming curation, batch twin ----------------------------------

  /** The streaming curation chain ([[graft.streaming.Streaming
    * .curatedMix]]: retransmission dedup → quality keep-filter →
    * windowed per-source mix report) run in BATCH mode — the SAME
    * plan-building function, so the oracle hash-gates exactly what the
    * stream executes (StreamingSpec separately pins stream-vs-batch
    * agreement and checkpoint-restart). The input unions a
    * deterministic re-emission of docs 0–24 (identical rows re-sent —
    * a retry burst) so the gate PROVES the dedup stage collapses them:
    * without it the report would double-count those windows.
    */
  def streamCurationMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val reemitted = docs.unionByName(docs.filter(col("doc_id") < 25))
    graft.streaming.Streaming.curatedMix(
        graft.streaming.Streaming.withDocTime(reemitted))
      .orderBy(col("w_start"), col("source"))
  }

  private val streamCurationOracle = {
    val epoch = graft.streaming.Streaming.DocEpoch
    s"""WITH base AS (
       |  SELECT * FROM documents
       |  UNION ALL SELECT * FROM documents WHERE doc_id < 25),
       |t AS (
       |  SELECT doc_id, text, source, n_chars,
       |    md5(text) AS content_hash,
       |    ($epoch + doc_id*7) // 300 AS w_tag
       |  FROM base),
       |d AS (
       |  SELECT * FROM (
       |    SELECT t.*, row_number() OVER (
       |      PARTITION BY content_hash, source, w_tag ORDER BY doc_id) AS rk
       |    FROM t) WHERE rk = 1),
       |k AS (SELECT * FROM d WHERE ${graft.operators.TextOps.qualityReasonSql("text")} = 'keep')
       |SELECT w_tag*300 AS w_start, source, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS chars_total
       |FROM k GROUP BY w_tag, source ORDER BY w_start, source""".stripMargin
  }

  /** Epoch-deterministic corpus shuffle + sharding (round 7) — the
    * step between curation and the training loop: every epoch needs a
    * DIFFERENT but fully reproducible global permutation of the
    * corpus, materialized as N balanced shards each in its shuffled
    * order. The permutation key is md5(epoch ‖ doc_id) — a pure
    * function of identity, so any worker (or either engine) re-derives
    * the same order with no coordination; changing EPOCH re-shuffles
    * everything. Shape: narrow scan → ONE hash exchange on shard →
    * per-shard sort (the sort IS the product: shard files written in
    * `pos` order are the training read order). At 100 TB each shard
    * sorts corpus/N rows independently — the classic "sort by random
    * key" global shuffle, made restartable by determinism. Verify-only:
    * the partition-sort physical shape is the benched window family's.
    */
  def shardEpoch(spark: SparkSession, sfDir: String): DataFrame = {
    val EPOCH = 1
    val NSHARDS = 8
    val h = TextOps.h60(concat(lit(s"epoch${EPOCH}_"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", (col("h") % NSHARDS).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy(col("shard"), col("pos"))
  }

  private val shardEpochOracle = {
    val h = TextOps.h60Sql("('epoch1_' || CAST(doc_id AS VARCHAR))")
    s"""WITH s AS (
       |  SELECT doc_id, $h AS h, CAST($h % 8 AS INT) AS shard
       |  FROM documents)
       |SELECT shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos,
       |  doc_id
       |FROM s ORDER BY shard, pos""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("shard_epoch", Some(shardEpochOracle), shardEpoch),
    Q("stream_curation_mix", Some(streamCurationOracle), streamCurationMix),
    Q("quality_classifier", Some(qcOracle), qualityClassifier),
    Q("dsir_select", Some(dsirOracle), dsirSelect),
    Q("docs_mix_report", Some(mixReportOracle), mixReport),
    Q("agg_histogram", Some(histogramOracle), aggHistogram),
    Q("snapshot_diff", Some(snapshotDiffOracle), snapshotDiff),
    Q("dq_expectations", Some(dqOracle), dqExpectations),
    Q("profile_columns", Some(profileOracle), profileColumns),
    Q("sample_stratified", Some(sampleOracle), sampleStratified),
    Q("sample_bottomk", Some(bottomkOracle), sampleBottomK),
    Q("mix_temperature", Some(mixOracle), mixTemperature),
    Q("domain_cap", Some(domainCapOracle), domainCap),
    Q("sample_split", Some(splitOracle), sampleSplit),
    Q("contamination_check", Some(contaminationOracle), contamination),
    Q("emb_quantize", Some(quantizeOracle), embQuantize),
    Q("pack_sequences", Some(packOracle), packSequences),
    Q("merge_upsert", Some(mergeOracle), mergeUpsert),
    Q("emb_centroids", Some(centroidsOracle), embCentroids),
  )
}
