package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table catalog over a driver testdata scale-factor directory.
  *
  * Plays the role of the reference's source layer
  * (`/root/reference/dags/dag.py:65-119` scrape + `:32-62` Postgres DDL):
  * in this engine every table is a columnar parquet scan, so Catalyst
  * gets filter pushdown / column pruning / partition-sized splits for
  * free — the properties the reference's row-wise requests+INSERT path
  * lacks. At 100 TB each `spark.read.parquet` becomes a multi-file scan
  * whose parallelism is governed by `spark.sql.files.maxPartitionBytes`;
  * nothing here materializes on the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` normalization — the testdata's timestamp flavor has
    * varied across driver generations and Spark 4 is strict about all
    * of them, so handle every case here, once:
    *  - parquet TIMESTAMP(NANOS): rejected outright
    *    ([PARQUET_TYPE_ILLEGAL]) — read as a raw nanos long (legacy
    *    conf) and rebuild a microsecond TimestampType. The ns→µs
    *    division MUST be integral (`div`): epoch-nanos ≈ 1.7e18
    *    exceeds a double's 2^53 exact-integer range, so `/ 1000`
    *    would corrupt timestamps.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    *    TIMESTAMP_NTZ (Spark 4 default) — NTZ can't be a watermark
    *    event time or cast to numeric, so cast to TimestampType. The
    *    session timezone is pinned UTC everywhere, so the wall-clock
    *    values (what the oracle compares) are unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(s, d, "events"))
  }

  private def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => raw
    }
  /** Streaming form of [[events]]: file-source over a directory of
    * events parquet, with the same ns→µs timestamp rebuild. The
    * directory is the streaming unit (new files = new micro-batch
    * input), which is how a 100 TB ingest lands: writers drop files,
    * readers stream the directory.
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(dir).schema // nanos long or µs NTZ
    val raw = s.readStream.schema(rawSchema).format("parquet").load(dir)
    normalizeTs(raw)
  }

  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")

  /** Streaming form of [[documents]]: file-source over a directory of
    * documents parquet (new files = new micro-batch input — the shape
    * of a landing zone that curation streams from). Event time is NOT
    * added here; callers attach it
    * ([[graft.streaming.Streaming.withDocTime]]).
    */
  def documentsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(dir).schema
    s.readStream.schema(schema).format("parquet").load(dir)
  }
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
