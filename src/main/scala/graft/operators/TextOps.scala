package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / hashing primitives shared by the dedup, similarity
  * and text-analysis operators, with DuckDB-SQL twins for the oracle.
  *
  * Design constraint: every primitive must be EXPRESSIBLE IN BOTH
  * ENGINES with bit-identical results, so whole pipelines (MinHash →
  * LSH → verify) can be hash-compared end-to-end. The only hash both
  * engines share is md5, so all integer hashes derive from it:
  * `h60(s)` = first 15 hex digits of md5 as a 60-bit non-negative
  * long; `h31(s)` = `h60 mod (2^31-1)` for overflow-safe affine
  * permutations (`a·h31+b mod p` stays under 63 bits).
  *
  * Everything here is built-in codegen'd expressions — no UDFs — so
  * tokenize/hash stays inside WholeStageCodegen at 100 TB.
  */
object TextOps {

  /** Whitespace tokens (the engine's `.split(' ')` convention — same
    * as DuckDB `string_split(text,' ')`).
    */
  def words(c: Column): Column = split(c, " ")

  val wordsSql = "string_split(text, ' ')"

  /** Distinct word-3-shingles of a words array (n-gram Jaccard unit).
    * One pass, no explode, no shuffle — and fully codegen'd: built on
    * the native [[graft.functions.WordNGrams]] expression rather than
    * the interpreted `transform(sequence(...))` higher-order-function
    * spelling (HOF lambdas never enter whole-stage codegen; the
    * interpreted path dominated cold runs of the shingle pipelines).
    */
  def shingles3(spark: org.apache.spark.sql.SparkSession, ws: Column): Column =
    array_distinct(graft.functions.GraftFunctions.wordNGrams(spark, ws, 3))

  /** DuckDB twin of distinct word n-grams (1-based list indexing) —
    * the SQL form of `array_distinct(graft_word_ngrams(ws, n))`.
    */
  def ngramsDistinctSql(ws: String, n: Int): String = {
    val parts = (0 until n)
      .map(k => if (k == 0) s"$ws[i]" else s"$ws[i+$k]").mkString("||' '||")
    s"list_distinct(list_transform(generate_series(1, greatest(len($ws)-${n - 1}, 0)), " +
      s"i -> $parts))"
  }

  /** DuckDB twin of [[shingles3]]. */
  def shingles3Sql(ws: String): String = ngramsDistinctSql(ws, 3)

  /** 60-bit non-negative hash of a string: first 15 hex digits of md5. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h60Sql(s: String): String =
    s"CAST('0x'||substr(md5($s),1,15) AS BIGINT)"

  /** [[h60]] as Spark-SQL text (the DuckDB dialect above spells hex
    * casts differently) — for statements routed through
    * [[graft.GraftSql]] where the predicate must live IN the SQL.
    */
  def h60SparkSql(s: String): String =
    s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT)"

  /** Mersenne prime 2^31-1: modulus of the MinHash permutation family. */
  val P31 = 2147483647L

  /** `h60 mod p` — small enough that `a·h31+b` never overflows a long
    * for the permutation constants used by [[Dedup]].
    */
  def h31(c: Column): Column = h60(c) % P31

  def h31Sql(s: String): String = s"(${h60Sql(s)} % $P31)"

  /** Stopword set shared by the quality-scoring family. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** The C4/Gopher-style keep/drop decision: each document's FIRST
    * failing rule, else "keep". Factored out of the
    * `docs_filter_funnel` query (round 6) so the streaming curation
    * pipeline applies the IDENTICAL rule set — one definition, batch
    * and stream. All built-in codegen'd expressions over one text
    * column; at 100 TB this is a narrow scan-stage decision.
    */
  def qualityReason(text: Column): Column = {
    val ws = words(text)
    val nWords = size(ws)
    val nStop = size(filter(ws, w => w.isInCollection(stopwords)))
    val noSpace = length(regexp_replace(text, " ", ""))
    val alnum = length(regexp_replace(text, "[^a-z0-9 ]", ""))
    val avgWordLen = noSpace.cast("double") / nWords
    val nonalnum = (length(text) - alnum).cast("double") / length(text)
    val stopRatio = nStop.cast("double") / nWords
    when(nWords < 20, "too_short")
      .when(nWords > 5000, "too_long")
      .when(avgWordLen < 3.0 || avgWordLen > 12.0, "word_len")
      .when(nonalnum > 0.3, "symbols")
      .when(stopRatio < 0.01, "no_stopwords")
      .otherwise("keep")
  }

  /** DuckDB twin of [[qualityReason]] as a single CASE expression over
    * column (or expression) `t`. Same IEEE operations in the same
    * order as the Column form, so the decision is bit-identical.
    */
  def qualityReasonSql(t: String = "text"): String = {
    val stop = stopwords.map(s => s"'$s'").mkString(", ")
    val nw = s"len(string_split($t, ' '))"
    val noSpace = s"length(regexp_replace($t, ' ', '', 'g'))"
    s"""CASE WHEN $nw < 20 THEN 'too_short'
       |  WHEN $nw > 5000 THEN 'too_long'
       |  WHEN CAST($noSpace AS DOUBLE)/$nw < 3.0
       |    OR CAST($noSpace AS DOUBLE)/$nw > 12.0 THEN 'word_len'
       |  WHEN CAST(length($t) - length(regexp_replace($t, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
       |    /length($t) > 0.3 THEN 'symbols'
       |  WHEN CAST(len(list_filter(string_split($t, ' '), w -> w IN ($stop))) AS DOUBLE)
       |    /$nw < 0.01 THEN 'no_stopwords'
       |  ELSE 'keep' END""".stripMargin
  }
}
