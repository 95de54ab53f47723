package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
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

  /** documents → typed media assets: modality from id, payload bytes. */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  private val kindSql =
    """CASE WHEN doc_id % 3 = 0 THEN 'image'
      |     WHEN doc_id % 3 = 1 THEN 'audio'
      |     ELSE 'video' END""".stripMargin

  /** Decode stage: one codec per partition (the mapInPandas batch
    * shape), streaming rows through it.
    */
  def decode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .mapPartitions { it =>
        val codec = new Multimodal.FakeCodec // per-partition, not per-row
        it.map(codec.decode)
      }
      .toDF()
      .orderBy(col("asset_id"))
  }

  private val decodeOracle =
    s"""SELECT doc_id AS asset_id, $kindSql AS kind,
       |  CAST(length(text) AS INT) AS n_bytes,
       |  CAST(16 + CAST('0x'||substr(md5(text),1,4) AS INT) % 1024 AS INT) AS width,
       |  CAST(16 + CAST('0x'||substr(md5(text),5,4) AS INT) % 1024 AS INT) AS height,
       |  md5(text) AS checksum
       |FROM documents ORDER BY asset_id""".stripMargin

  /** Feature-extraction stage: fixed-shape histogram features + a
    * stride-16 "frame sample" digest, again one codec per partition.
    */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .mapPartitions { it =>
        val codec = new Multimodal.FakeCodec
        it.map(codec.features)
      }
      .toDF()
      .orderBy(col("asset_id"))
  }

  private def classCount(re: String) =
    s"CAST(length(text) - length(regexp_replace(text, '$re', '', 'g')) AS BIGINT)"

  private val featuresOracle =
    s"""SELECT doc_id AS asset_id,
       |  ${classCount("[a-e]")} AS f0,
       |  ${classCount("[f-j]")} AS f1,
       |  ${classCount("[k-o]")} AS f2,
       |  ${classCount("[p-t]")} AS f3,
       |  ${classCount("[u-z]")} AS f4,
       |  ${classCount(" ")} AS f5,
       |  ${classCount("[0-9]")} AS f6,
       |  ${classCount("[^a-z0-9 ]")} AS f7,
       |  md5(array_to_string(list_transform(
       |    generate_series(0, (length(text)-1)//16),
       |    i -> substr(text, CAST(i*16+1 AS INT), 1)), '')) AS sample_md5
       |FROM documents ORDER BY asset_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("multimodal_decode", Some(decodeOracle), decode),
    Q("multimodal_features", Some(featuresOracle), features),
  )
}
