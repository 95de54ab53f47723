package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sink/source — the engine's form of the reference's RDBMS
  * loads (`/root/reference/dags/dag.py:198-227`: a PostgresHook
  * `INSERT` per row into `books` / `enriched_books`).
  *
  * Spark-first translation: ONE `df.write.format("jdbc")` statement.
  * Executors open `numPartitions` connections and stream rows in
  * `batchsize`-sized prepared-statement batches — set-based, not
  * row-at-a-time (the reference's 1-connection-per-row loop is its
  * documented bottleneck; BASELINE.md). At cluster scale the write
  * parallelism is the partition count, so `numPartitions` caps the
  * connection fan-in the database sees.
  *
  * The capability is exercised against embedded Derby in JdbcSinkSpec
  * (the sandbox has no server RDBMS); the code path is identical for
  * Postgres et al. — only `url`/`driver` change.
  */
object JdbcSink {

  /** Set-based JDBC write. `mode=Overwrite` drops and recreates the
    * table from the DataFrame schema (the reference's
    * CREATE-IF-ABSENT + idempotent reload, collapsed into one op).
    */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      driver: String,
      mode: SaveMode = SaveMode.Overwrite,
      numPartitions: Int = 4,
      batchSize: Int = 1000,
      columnTypes: Option[String] = None): Unit = {
    // columnTypes ("col VARCHAR(128), ..."): override the dialect's
    // default DDL mapping — e.g. Derby maps StringType to CLOB, which
    // its own engine can't compare in pushed-down predicates; key
    // columns should be VARCHAR(n)
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("numPartitions", numPartitions)
      .option("batchsize", batchSize)
      .mode(mode)
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t)).save()
  }

  /** Read a JDBC table back as a DataFrame (round-trip check + the
    * reference's downstream-consumer path).
    */
  def read(spark: SparkSession, url: String, table: String, driver: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .load()
}
