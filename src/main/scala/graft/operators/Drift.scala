package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift algebra, factored so batch (`text_kl_drift`) and the
  * streaming monitor ([[graft.streaming.Streaming.monitorDrift]])
  * apply the IDENTICAL definition — the same one-definition rule as
  * [[TextOps.qualityReason]] for the curation filter.
  *
  * The state is the (source, word, cnt) count table: MERGEABLE
  * (counts add, order-free) and vocabulary-sized — MBs when the
  * corpus is TBs — which is exactly what makes incremental
  * maintenance O(batch + vocab) instead of O(corpus history).
  */
object Drift {

  /** (source, word, cnt) counts of a documents frame. DECIMAL(18,0)
    * is the stable cross-version schema (a fixed parquet type, so
    * every snapshot version round-trips identically). Headroom: 1e18
    * tokens per (source, word) CELL; 100 TB of text is ~2e13 tokens
    * total, so even a single cell holding the whole corpus sits 4–5
    * orders of magnitude below the ceiling.
    */
  def docCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TextOps.words(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("decimal(18,0)").as("cnt"))

  /** Down-cast an accumulated sum back to the stable DECIMAL(18,0)
    * cell type, failing LOUDLY on overflow: with ANSI mode off a bare
    * cast nulls the overflowing cell, which would silently poison the
    * streaming drift state (klFromCounts would drop that word's mass
    * with no error). An engine that corrupts state quietly is worse
    * than one that stops.
    */
  private def toStableCnt(s: org.apache.spark.sql.Column) =
    when(s < lit("1000000000000000000").cast("decimal(38,0)"),
      s.cast("decimal(18,0)"))
      .otherwise(raise_error(concat(
        lit("drift count overflow past DECIMAL(18,0): "), s.cast("string"))))

  /** Merge two count tables (prev snapshot ⊎ batch delta). */
  def mergeCounts(prev: DataFrame, delta: DataFrame): DataFrame =
    prev.unionByName(delta)
      .groupBy(col("source"), col("word"))
      .agg(toStableCnt(sum(col("cnt"))).as("cnt"))

  /** Per-source KL(source ‖ corpus) report from a count table.
    *
    * Float determinism (the `text_lm_score` rule): each word's
    * ln((cnt_sw·tot)/(tot_s·cw)) is quantized once to
    * DECIMAL(20,12), weighted by the exact integer count and summed
    * as decimals — order-free across any partitioning — with one
    * IEEE division by tot_s at the end, then round(4). All inputs to
    * every ln are exact integers, so both engines (and the
    * incremental and batch paths) see bit-identical arguments.
    */
  def klFromCounts(counts: DataFrame): DataFrame = {
    val vocab = counts.groupBy(col("word"))
      .agg(sum(col("cnt")).cast("double").as("cw"))
    val tot = vocab.agg(sum(col("cw")).as("tot"))
    val srcTot = counts.groupBy(col("source"))
      .agg(sum(col("cnt")).cast("double").as("tot_s"),
        count(lit(1)).as("vocab_s"))
    counts
      .join(broadcast(srcTot), "source")
      .join(vocab, "word")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("tot_s"), col("vocab_s"), col("cnt"),
        log((col("cnt").cast("double") * col("tot"))
          / (col("tot_s") * col("cw"))).cast("decimal(20,12)").as("lnr"))
      .groupBy(col("source"))
      .agg(first(col("tot_s")).cast("long").as("n_tokens"),
        first(col("vocab_s")).as("n_vocab"),
        // cnt is stored DECIMAL(18,0) but scored at (17,0): 17+20+1 =
        // 38 keeps the product EXACT decimal(38,12) in both engines;
        // at (18,0) Spark would overflow precision 39 and silently
        // truncate the scale (allowPrecisionLoss), breaking the
        // bit-identical-across-engines summation rule
        round(sum(col("cnt").cast("decimal(17,0)") * col("lnr")).cast("double")
          / first(col("tot_s")), 4).as("kl_nats"))
      .orderBy(col("source"))
  }
}
