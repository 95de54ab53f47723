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

  def queries: Seq[Q] = Seq(
    Q("udaf_weighted_avg", Some(udafOracle), udafWeightedAvg),
    Q("json_extract", Some(jsonOracle), jsonExtract),
    Q("explode_words", Some(explodeOracle), explodeWords),
  )
}
