package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.WeightedAvgFixed
import graft.operators.Enrich
import graft.sources.Tables

/** The UDF/UDAF/UDTF extensibility surface (SURVEY.md §2.8):
  *  - a custom typed `Aggregator` UDAF (the reference's
  *    `groupby().apply` weighted sum, `dag.py:167`),
  *  - semi-structured field extraction (the reference's BeautifulSoup
  *    CSS-selector projection, `dag.py:83-105`, re-expressed over the
  *    `events.props` JSON column with a codegen'd built-in),
  *  - a generator/UDTF fan-out (one page → many records, `dag.py:85`,
  *    re-expressed as explode over a split).
  */
object Extensibility {

  /** §2.8 UDAF: weighted average of extendedprice by quantity per
    * return flag, through the custom `Aggregator`. Exact fixed-point —
    * see [[graft.functions.WeightedAvgFixed]].
    */
  def udafWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val wavg = udaf(new WeightedAvgFixed(100L),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    val qty = col("l_quantity").cast("long")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(wavg(cents, qty).as("weighted_avg_price"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  private val udafOracle =
    s"""SELECT l_returnflag,
       |  ${Enrich.roundDiv4Sql(
            "sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) * CAST(l_quantity AS BIGINT))",
            "100*sum(CAST(l_quantity AS BIGINT))")} AS weighted_avg_price,
       |  count(*) AS n_lines
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** §2.8 scalar extraction: JSON path over `events.props` — the
    * semi-structured analog of the reference's per-container CSS-class
    * field extraction. `get_json_object` is a codegen'd built-in; no
    * UDF in the hot path.
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(spark, sfDir)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).cast("long").as("k_sum"),
        Enrich.roundDiv4(sum(col("k")), count(col("k"))).as("k_avg"))
      .orderBy(col("event_type"))
  }

  private val jsonOracle =
    s"""WITH e AS (
       |  SELECT event_type, CAST(json_extract_string(props, '$$.k') AS INT) AS k
       |  FROM events)
       |SELECT event_type, count(*) AS n_events,
       |  CAST(sum(k) AS BIGINT) AS k_sum,
       |  ${Enrich.roundDiv4Sql("sum(k)", "count(k)")} AS k_avg
       |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** §2.8 UDTF/generator: one document row fans out to N word rows
    * (`explode(split(...))` = the Spark-native `find_all` loop,
    * `dag.py:85-106`), then global term frequencies. The explode runs
    * inside whole-stage codegen; only the word-count aggregation
    * shuffles.
    */
  def explodeWords(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))

  private val explodeOracle =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY word""".stripMargin

  /** Input row for [[typedUserGaps]] — `java.time.Instant` keeps the
    * full microsecond precision of Spark's internal TimestampType
    * (java.sql.Timestamp.getTime would truncate to millis and drift
    * from the oracle's epoch_us).
    */
  final case class Ev(event_id: Long, ts: java.time.Instant, user_id: Long)
  final case class UserGap(user_id: Long, n_events: Long, max_gap_us: Long)

  /** The typed `KeyValueGroupedDataset.mapGroups` surface: per-user
    * max inter-event gap, computed imperatively inside each group.
    * This is the escape hatch for genuinely sequential per-group
    * logic (the relational spelling is a lag window — the oracle uses
    * exactly that). Scale contract: one shuffle on the group key,
    * each group materialized in one task — right when groups are
    * bounded (a user's events), wrong for whole-partition state.
    * Deterministic: events sorted by (ts, event_id) inside the group.
    */
  def typedUserGaps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def us(t: java.time.Instant): Long =
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (us(e.ts), e.event_id))
        var mx = 0L
        var i = 1
        while (i < evs.length) {
          val g = us(evs(i).ts) - us(evs(i - 1).ts)
          if (g > mx) mx = g
          i += 1
        }
        UserGap(uid, evs.length.toLong, mx)
      }
      .toDF()
      .orderBy(col("user_id"))
  }

  private val userGapsOracle =
    """WITH g AS (
      |  SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id) AS gap
      |  FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  coalesce(max(gap), 0) AS max_gap_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  final case class Doc(doc_id: Long, text: String)
  final case class Vec(vec_id: Long, embedding: Seq[Float])
  final case class DocVec(doc_id: Long, n_words: Int, emb_norm: Double)

  /** The typed `cogroup` surface: documents and their embedding rows
    * co-grouped by id, one output row when both sides are present
    * (inner-join semantics, but with BOTH groups available to
    * imperative code — the shape `mapGroups` can't express). The
    * norm accumulates sequentially in double, bit-identical to the
    * oracle's `list_dot_product`. One co-shuffle on the key; each
    * pair of groups lands in one task.
    */
  def typedCogroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[Doc]
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).as[Vec]
    docs.groupByKey(_.doc_id)
      .cogroup(vecs.groupByKey(_.vec_id)) { (id, ds, vs) =>
        val d = ds.toSeq
        val v = vs.toSeq
        if (d.isEmpty || v.isEmpty) Iterator.empty
        else {
          val words = d.head.text.split(" ", -1).length
          var s = 0.0
          v.head.embedding.foreach { x => val xd = x.toDouble; s += xd * xd }
          Iterator.single(DocVec(id, words, math.sqrt(s)))
        }
      }
      .toDF()
      // round in the DataFrame layer: Spark round() is the engine-pair
      // already proven against DuckDB round() across this suite
      .withColumn("emb_norm", round(col("emb_norm"), 6))
      .orderBy(col("doc_id"))
  }

  private val cogroupOracle =
    """SELECT d.doc_id,
      |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_words,
      |  round(sqrt(list_dot_product(
      |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
      |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)))), 6) AS emb_norm
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |ORDER BY d.doc_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("udaf_weighted_avg", Some(udafOracle), udafWeightedAvg),
    Q("json_extract", Some(jsonOracle), jsonExtract),
    Q("explode_words", Some(explodeOracle), explodeWords),
    Q("typed_mapgroups", Some(userGapsOracle), typedUserGaps),
    Q("typed_cogroup", Some(cogroupOracle), typedCogroup),
  )
}
