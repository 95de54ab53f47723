package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cleaning / standardisation operators — the Spark-native form of the
  * reference's `standardise_book_data`
  * (`/root/reference/dags/dag.py:126-149`).
  *
  * Every op is a pure `DataFrame => DataFrame` built from codegen'd
  * built-ins (`functions._`), so the whole standardise stage stays inside
  * one WholeStageCodegen span and pushes through the parquet scan where
  * possible. Nothing here shuffles except [[dedupFirst]] (one shuffle on
  * the dedup key — unavoidable for exact dedup; at 100 TB the key should
  * be a hash-bucketed column so AQE can coalesce post-shuffle partitions).
  */
object Standardise {

  /** Whitespace trim (`dag.py:95,101-105` `.text.strip()`). */
  def trimmed(c: Column): Column = trim(c)

  /** "4.5 out of 5 stars" → 4.5, null when absent (`dag.py:141-142`).
    * `regexp_extract` returns "" on no-match, so `nullif` before the
    * cast keeps ANSI mode happy and mirrors pandas' NaN.
    */
  def extractRating(c: Column): Column =
    nullif(regexp_extract(c, "(\\d\\.\\d)", 1), lit("")).cast("double")

  /** "1,234" → 1234 (`dag.py:145-146` comma strip + to_numeric). */
  def parseCount(c: Column): Column =
    regexp_replace(c, ",", "").cast("int")

  /** String price → double (`dag.py:138` pd.to_numeric). */
  def parsePrice(c: Column): Column = c.cast("double")

  /** First-wins dedup with a DETERMINISTIC tie-break — the correct form
    * of `drop_duplicates(subset='Title')` (`dag.py:135`). Plain
    * `dropDuplicates` keeps an arbitrary partition-order-dependent row;
    * `row_number` over an explicit ordering is reproducible and costs
    * the same single shuffle.
    */
  def dedupFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Abort on empty input (`dag.py:129-130` ValueError guard).
    * `df.isEmpty` runs a cheap limit-1 job — it does NOT scan the full
    * input.
    */
  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    if (df.isEmpty) throw new IllegalStateException(s"No $what found")
    df
  }
}
