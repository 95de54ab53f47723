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

  /** (source, word, cnt) counts of a documents frame. DECIMAL(12,0)
    * is the stable cross-version schema: merged sums are cast back
    * down (safe far beyond 100 TB of tokens per (source, word) cell),
    * so every snapshot version round-trips the same parquet type.
    */
  def docCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TextOps.words(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("decimal(12,0)").as("cnt"))

  /** Merge two count tables (prev snapshot ⊎ batch delta). */
  def mergeCounts(prev: DataFrame, delta: DataFrame): DataFrame =
    prev.unionByName(delta)
      .groupBy(col("source"), col("word"))
      .agg(sum(col("cnt")).cast("decimal(12,0)").as("cnt"))

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
        round(sum(col("cnt") * col("lnr")).cast("double")
          / first(col("tot_s")), 4).as("kl_nats"))
      .orderBy(col("source"))
  }
}
