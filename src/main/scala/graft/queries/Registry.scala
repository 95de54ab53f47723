package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checked query capability.
  *
  * @param name   stable query id (key in `SparkEntry.queries`)
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables
  *               (bare table names — the driver maps each testdata
  *               parquet to a view of that name). None ⇒ the driver
  *               falls back to a rows-only check.
  * @param build  (session, sfDir) ⇒ result DataFrame. Must be
  *               deterministic: explicit orderBy, round(_,4) on float
  *               aggregates, row_number tie-breaks for dedups — see
  *               SURVEY.md §7.4.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

/** Central inventory: every operator capability from SURVEY.md §2 plus
  * the LLM-data-pipeline extensions, each as a named query + oracle.
  */
object Registry {
  def all: Seq[Q] =
    RefSurface.queries ++
      Extensibility.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      TextQueries.queries ++
      MultimodalQueries.queries ++
      WindowQueries.queries ++
      ScaleQueries.queries ++
      SqlSurface.queries ++
      StatsQueries.queries ++
      BreadthQueries.queries ++
      AsofQueries.queries ++
      PipelineQueries.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
