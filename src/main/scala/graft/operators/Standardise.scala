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
    *
    * CONTRACT (narrower than a window's, r15 ADVICE): since the pick is
    * `min(struct(order…, payload…))`, every `order` column must be a
    * plain ASCENDING expression (a `col(...).desc` sort order fails
    * analysis inside `struct`) and EVERY payload column must be
    * orderable (a MapType payload breaks where `row_number` only
    * required the order columns to be orderable). Rows tied on all
    * order columns break deterministically on the remaining payload
    * fields; callers already require tied rows to be output-identical.
    */
  def dedupFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame = {
    // min(struct(order…, payload…)) instead of a row_number window
    // (round 15): the window form shuffles EVERY input row to its key
    // partition and sorts there before discarding all but one row per
    // key; the aggregate form collapses to one row per key per map
    // partition BEFORE the exchange (partial aggregation), so the
    // shuffle carries |keys|-bounded rows instead of the corpus —
    // guide §2.3 "aggregate before you shuffle". Equivalence: the
    // struct comparator is field-by-field ascending with nulls first,
    // exactly the window's default orderBy; payload columns ride
    // BEHIND the order columns in the struct, so residual ties break
    // deterministically on the full row (the window form left such
    // ties to sort stability — callers already require tied rows to be
    // output-identical, where both forms agree).
    val payload = df.columns
    val packed = struct(
      order.zipWithIndex.map { case (o, i) => o.as(s"__o$i") } ++
        payload.map(c => col(c).as(c)): _*)
    df.groupBy(key: _*)
      .agg(min(packed).as("__first"))
      .select(payload.map(c => col(s"__first.$c").as(c)): _*)
  }

  /** Name-based overload for the common case where key and order are
    * plain columns of `df` (round 16): the packed struct then carries
    * each column ONCE — order columns are not duplicated into the
    * payload tail (the Column overload packs them twice: once as the
    * comparator prefix, once as payload) and key columns, constant
    * within a group, ride in the GROUPING key instead of the struct.
    * The aggregation buffer and the exchange carry exactly
    * |order| + |extras| fields instead of |order| + |all columns| —
    * for `dedup_limit`'s projected call site that is 4 fields instead
    * of 20. Same pick as the Column overload: after the order columns,
    * ties break on the remaining payload columns in `df.columns`
    * order; the dropped duplicate fields can never change the
    * comparison (a duplicated order column always ties with itself,
    * a key column is group-constant), so the selected row — and on
    * residual full-struct ties the output row — is identical.
    */
  def dedupFirst(df: DataFrame, key: Seq[String], order: Seq[String])
      (implicit d: DummyImplicit): DataFrame = {
    require((key ++ order).forall(df.columns.contains),
      "name-based dedupFirst requires key/order to be columns of df")
    val extras = df.columns.filterNot(c => key.contains(c) || order.contains(c))
    val packed = struct((order ++ extras).map(col): _*)
    df.groupBy(key.map(col): _*)
      .agg(min(packed).as("__first"))
      .select(df.columns.toSeq.map(c =>
        (if (key.contains(c)) col(c) else col(s"__first.$c")).as(c)): _*)
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
