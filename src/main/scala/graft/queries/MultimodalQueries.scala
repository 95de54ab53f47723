package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextOps}
import graft.operators.Multimodal.{Asset, Decoded, Features}
import graft.sources.Tables

/** Multimodal binary-column queries (SURVEY.md §7.2 M4 north star).
  *
  * `documents.text` stands in for raw media bytes (`cast(text as
  * binary)` → an opaque payload column); a real deployment reads
  * image/audio blobs the same way (parquet `binary` columns). The
  * decode/feature stages run through typed `Dataset.mapPartitions`
  * with per-partition codec setup — see [[graft.operators.Multimodal]]
  * for what's real plumbing vs deterministic-fake codec.
  */
object MultimodalQueries {

  /** documents → typed media assets: REAL container bytes (BMP / WAV /
    * Y4M — [[graft.operators.Multimodal.MediaFixtures]]), generated
    * deterministically from (doc_id, n_chars) so the oracle can
    * predict what a correct PARSER must recover from them.
    */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        Asset(id, Multimodal.MediaFixtures.kindOf(id),
          Multimodal.MediaFixtures.payloadFor(id, nChars))
      })
  }

  private val kindSql =
    """CASE WHEN doc_id % 3 = 0 THEN 'image'
      |     WHEN doc_id % 3 = 1 THEN 'audio'
      |     ELSE 'video' END""".stripMargin

  /** The fixture dimension formulas, shared by both oracles (the
    * DuckDB mirror of [[Multimodal.MediaFixtures.payloadFor]]).
    */
  private val dimsSql =
    s"""d AS (
       |  SELECT doc_id, n_chars, $kindSql AS kind,
       |    16 + doc_id % 13 AS iw, 8 + n_chars % 7 AS ih,
       |    64 + n_chars % 64 AS an, 8000 + (doc_id % 8) * 1000 AS asr,
       |    8 + doc_id % 6 AS vw, 4 + n_chars % 5 AS vh, 2 + doc_id % 3 AS vf
       |  FROM documents)""".stripMargin

  /** Decode stage: one codec per partition (the mapInPandas batch
    * shape), streaming rows through a REAL parser of the container
    * bytes — header offsets, endianness, row padding, chunk walks and
    * plane layout all on the hash-gated path.
    */
  def decode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .mapPartitions { it =>
        val codec = new Multimodal.MediaCodec // per-partition, not per-row
        it.map(codec.decode)
      }
      .toDF()
      .orderBy(col("asset_id"))
  }

  /** The oracle predicts what the parser must RECOVER: header fields
    * and exact byte counts per container layout (BMP 54-byte header +
    * padded rows; WAV 44-byte RIFF/PCM preamble; Y4M ASCII header +
    * 6-byte FRAME markers + C444 planes).
    */
  private val decodeOracle =
    s"""WITH $dimsSql
       |SELECT doc_id AS asset_id, kind,
       |  CASE kind WHEN 'image' THEN 'bmp' WHEN 'audio' THEN 'wav' ELSE 'y4m' END AS container,
       |  CAST(CASE kind WHEN 'image' THEN iw WHEN 'audio' THEN 0 ELSE vw END AS INT) AS width,
       |  CAST(CASE kind WHEN 'image' THEN ih WHEN 'audio' THEN 0 ELSE vh END AS INT) AS height,
       |  CAST(CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN an ELSE vf END AS INT) AS n_frames,
       |  CAST(CASE kind WHEN 'audio' THEN asr ELSE 0 END AS INT) AS sample_rate,
       |  CAST(CASE kind
       |    WHEN 'image' THEN 54 + ((iw*3 + 3)//4)*4 * ih
       |    WHEN 'audio' THEN 44 + an*2
       |    ELSE length('YUV4MPEG2 W' || vw || ' H' || vh || ' F25:1 Ip A1:1 C444' || chr(10))
       |         + vf * (6 + 3*vw*vh)
       |  END AS INT) AS n_bytes
       |FROM d ORDER BY asset_id""".stripMargin

  /** Feature-extraction stage over the DECODED value stream (pixels /
    * samples / plane bytes — headers and row padding excluded, which
    * is exactly what makes these aggregates a parser gate).
    */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .mapPartitions { it =>
        val codec = new Multimodal.MediaCodec
        it.map(codec.features)
      }
      .toDF()
      .orderBy(col("asset_id"))
  }

  /** The oracle re-evaluates the fixture value formulas symbolically
    * (list comprehensions over the pixel/sample index space) — Spark
    * must arrive at the same numbers by parsing the actual bytes.
    */
  private val featuresOracle =
    s"""WITH $dimsSql,
       |vals AS (
       |  SELECT doc_id, kind,
       |    CASE kind
       |      WHEN 'image' THEN flatten(list_transform(range(0, ih), y ->
       |          flatten(list_transform(range(0, iw), x ->
       |            list_transform(range(0, 3), c -> (x*7 + y*13 + c*31 + doc_id) % 256)))))
       |      WHEN 'audio' THEN list_transform(range(0, an), t -> (t*17 + doc_id) % 256)
       |      ELSE flatten(list_transform(range(0, vf), f ->
       |          flatten(list_transform(range(0, 3), p ->
       |            flatten(list_transform(range(0, vh), y ->
       |              list_transform(range(0, vw), x -> (x*3 + y*5 + f*11 + p*17 + doc_id) % 256)))))))
       |    END AS v
       |  FROM d)
       |SELECT doc_id AS asset_id, kind,
       |  CAST(len(v) AS INT) AS n_values,
       |  CAST(list_aggregate(v, 'sum') AS BIGINT) AS v_sum,
       |  CAST(list_aggregate(v, 'max') AS INT) AS v_max,
       |  CAST(len(list_filter(v, x -> x >= 128)) AS BIGINT) AS n_high
       |FROM vals ORDER BY asset_id""".stripMargin

  private val FRAME_STRIDE = 2

  /** Frame sampling (round 7 — the brief's "frame-sample" stage made
    * literal now the decode is a real Y4M parser): video assets emit
    * one row per every-[[FRAME_STRIDE]]-th frame with that frame's
    * plane statistics; stills and audio yield no rows. Shape: the same
    * per-partition codec `mapPartitions`, but flatMap-style (one asset
    * → 0..N frames) — the Generator form of the decode stage. At
    * 100 TB this stays a narrow map over the scan: no shuffle until
    * the explicit output ordering, and sampled-frame fan-out is
    * bounded by stride, not payload size.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .mapPartitions { it =>
        val codec = new Multimodal.MediaCodec
        it.flatMap(codec.sampleFrames(_, FRAME_STRIDE))
      }
      .toDF()
      .orderBy(col("asset_id"), col("frame_id"))
  }

  /** Oracle: per-frame symbolic re-evaluation of the Y4M value formula
    * over sampled frame ids only — Spark must recover the same numbers
    * by slicing real frames out of the parsed byte stream.
    */
  private val frameSampleOracle =
    s"""WITH $dimsSql,
       |f AS (
       |  SELECT doc_id, vw, vh, fr
       |  FROM d, unnest(generate_series(0, vf - 1, $FRAME_STRIDE)) t(fr)
       |  WHERE kind = 'video'),
       |vals AS (
       |  SELECT doc_id, fr,
       |    flatten(list_transform(range(0, 3), p ->
       |      flatten(list_transform(range(0, vh), y ->
       |        list_transform(range(0, vw), x ->
       |          (x*3 + y*5 + fr*11 + p*17 + doc_id) % 256))))) AS v
       |  FROM f)
       |SELECT doc_id AS asset_id, CAST(fr AS INT) AS frame_id,
       |  CAST(len(v) AS INT) AS n_values,
       |  CAST(list_aggregate(v, 'sum') AS BIGINT) AS v_sum,
       |  CAST(list_aggregate(v, 'max') AS INT) AS v_max,
       |  CAST(len(list_filter(v, x -> x >= 128)) AS BIGINT) AS n_high
       |FROM vals ORDER BY asset_id, frame_id""".stripMargin

  // ---- cross-modal retrieval / fusion dedup (round 6) ------------------

  private val TEXT_DIMS = 64 // hashed-word buckets = image embedding dims
  private val CAP_NQ = 5 // caption queries: doc_id < CAP_NQ
  private val FUSE_NC = 8 // fusion SemDeDup coarse cells
  private val FUSE_EPS = 0.4

  /** Deterministic text-side embedding: a [[TEXT_DIMS]]-bucket hashed
    * word histogram per doc, as `array<double>` — the engine-portable
    * stand-in for a text-tower encoder (a real deployment swaps in
    * model inference via the [[Multimodal]] mapPartitions shape; every
    * downstream join/ANN stage is unchanged). One codegen'd hash
    * aggregate: 64 fused `sum(when(b = d))` expressions, the simhash
    * pattern — no explode-regroup, no HOF.
    */
  private def textEmbedding(docs: DataFrame): DataFrame = {
    val wd = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      .select(col("doc_id"), (TextOps.h31(col("w")) % TEXT_DIMS).as("b"))
    val aggs = (0 until TEXT_DIMS).map(d =>
      sum(when(col("b") === d, 1L).otherwise(0L)).cast("double").as(s"e$d"))
    wd.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until TEXT_DIMS).map(d => col(s"e$d")): _*).as("temb"))
  }

  /** DuckDB twin of [[textEmbedding]] as a CTE chain ending in
    * `temb(doc_id, emb)`; `filter` restricts the doc set (SQL over
    * `documents`), '' = all docs.
    */
  private def textEmbSql(filter: String): String = {
    val where = if (filter.isEmpty) "" else s" WHERE $filter"
    s"""tw AS (
       |  SELECT doc_id, (${TextOps.h31Sql("w")} % $TEXT_DIMS) AS b
       |  FROM (SELECT doc_id, unnest(${TextOps.wordsSql}) AS w
       |        FROM documents$where)),
       |tc AS (SELECT doc_id, b, count(*) AS c FROM tw GROUP BY doc_id, b),
       |grid AS (
       |  SELECT d.doc_id, g.b
       |  FROM (SELECT DISTINCT doc_id FROM documents$where) d,
       |       generate_series(0, ${TEXT_DIMS - 1}) g(b)),
       |temb AS (
       |  SELECT grid.doc_id,
       |    list(CAST(COALESCE(tc.c, 0) AS DOUBLE) ORDER BY grid.b) AS emb
       |  FROM grid LEFT JOIN tc ON grid.doc_id = tc.doc_id AND grid.b = tc.b
       |  GROUP BY grid.doc_id)""".stripMargin
  }

  /** Unit-normalize an `array<double>` column (elementwise divide by
    * the sequential-accumulation norm — both ops bit-identical to the
    * DuckDB twin `list_transform(v, x -> x / sqrt(list_dot_product))`).
    */
  private def l2normalize(spark: SparkSession, v: Column): Column = {
    val nrm = sqrt(graft.operators.Dedup.dot(v, v))
    transform(v, x => x / nrm)
  }

  /** Caption-to-image retrieval (the CLIP-style two-tower query): the
    * first [[CAP_NQ]] docs' text embeddings retrieve top-k nearest
    * IMAGE embeddings through the `sim_ann_pq` machinery —
    * [[SimilarityQueries.pqTopkPlan]] PQ-encodes the image corpus,
    * broadcasts the per-caption ADC lookup tables, and exact-reranks;
    * `excludeSelf = false` because caption i retrieving image i is
    * the alignment target, not a self-match artifact. On synthetic
    * data the cross-modal cosines are arbitrary — what's validated is
    * the full plan: modality-specific encoders feeding one shared ANN
    * index, every stage hash-gated.
    */
  def captionTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val img = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val captions = textEmbedding(
      Tables.documents(spark, sfDir).filter(col("doc_id") < CAP_NQ))
      .select(col("doc_id").as("q_id"), col("temb").as("emb_q"))
    SimilarityQueries.pqTopkPlan(spark, img, captions, excludeSelf = false)
  }

  private val captionOracle =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |${textEmbSql(s"doc_id < $CAP_NQ")},
       |qv AS (SELECT doc_id AS q_id, emb FROM temb),
       |${SimilarityQueries.pqSqlBody(excludeSelf = false)}""".stripMargin

  /** Fusion dedup: SemDeDup over JOINT text+image embeddings. Each
    * asset pairs its image embedding with its caption's text
    * embedding (doc_id = vec_id); both halves unit-normalize and
    * concatenate into one 128-dim vector (so fused cosine =
    * (text cosine + image cosine) / 2 — equal-weight late fusion),
    * then the standard trained-quantizer SemDeDup decision runs
    * unchanged over the fused space: [[graft.operators.Quantizer]]
    * trains [[FUSE_NC]] centroids, every vector with a same-cell
    * neighbor at fused cosine ≥ [[FUSE_EPS]] strictly closer to the
    * centroid is removed. Near-dups must agree in BOTH modalities to
    * cross the threshold — the multimodal-pair dedup shape (matching
    * captions on different images, or re-encoded images with edited
    * captions, stay). Same O(Σ|cell|²) equi-join scale shape as
    * `dedup_semantic`.
    */
  def fusionDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val img = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("iemb"))
    val fused = textEmbedding(Tables.documents(spark, sfDir))
      .join(img, col("doc_id") === col("vec_id"))
      .select(col("vec_id"),
        concat(l2normalize(spark, col("temb")),
          l2normalize(spark, col("iemb"))).as("emb"))
      // localCheckpoint: this derived corpus (explode + 64-way hash
      // aggregate + join) is scanned ~6x downstream — per Lloyd
      // iteration in the trainer, then in the dedup assignment and
      // join-back. Materializing it once cut the query 31 s → 19 s at
      // sf0.1 (measured; the residue is fixed per-stage overhead that
      // amortizes at scale); same lineage rule as quality_classifier.
      .localCheckpoint()
    val cent = graft.operators.Quantizer
      .trainedCentroids(spark, fused, FUSE_NC, dims = 2 * TEXT_DIMS)
    graft.operators.Dedup.semanticDedup(spark, fused, cent, FUSE_EPS)
      .select(col("c_id"), col("vec_id"), round(col("c_cos"), 6).as("centroid_cos"))
      .orderBy(col("c_id"), col("vec_id"))
  }

  private val fusionOracle =
    s"""WITH ie AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS iemb
       |  FROM embeddings),
       |${textEmbSql("")},
       |fused AS (
       |  SELECT ie.vec_id,
       |    list_concat(
       |      list_transform(t.emb, x -> x / sqrt(list_dot_product(t.emb, t.emb))),
       |      list_transform(ie.iemb, x -> x / sqrt(list_dot_product(ie.iemb, ie.iemb))))
       |      AS emb
       |  FROM temb t JOIN ie ON t.doc_id = ie.vec_id),
       |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM fused),
       |${graft.operators.Quantizer.trainedCentroidsSql(FUSE_NC, dims = 2 * TEXT_DIMS)},
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
       |  WHERE list_dot_product(a.emb, o.emb)/(a.nrm*o.nrm) >= $FUSE_EPS
       |    AND (o.c_cos < a.c_cos OR (o.c_cos = a.c_cos AND o.vec_id < a.vec_id)))
       |ORDER BY c_id, vec_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("multimodal_decode", Some(decodeOracle), decode),
    Q("multimodal_features", Some(featuresOracle), features),
    Q("multimodal_framesample", Some(frameSampleOracle), frameSample),
    Q("multimodal_caption_topk", Some(captionOracle), captionTopk),
    Q("multimodal_fusion_dedup", Some(fusionOracle), fusionDedup),
  )
}
