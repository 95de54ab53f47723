package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators: choosing WHICH documents feed training —
  * the curation stage the reference has no analog for (its pipeline
  * keeps everything it scrapes). Currently DSIR; sampling/mixing live
  * as queries in `graft.queries.PipelineQueries`.
  */
object Selection {

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") as a reusable
    * operator. Input `docs` must carry `idCol`, `textCol`, and the
    * boolean `isTarget` marking the rows that define the target
    * distribution (in production: a UNION of the small clean target
    * corpus with the raw pool). Features are whitespace words hashed
    * into `nBuckets`; per-doc
    * `log w(x) = Σ_b n_b(x)·(ln p_target(b) − ln p_raw(b))`
    * with +1 smoothing.
    *
    * Returns (doc_id, logw) for every input doc WITH at least one
    * word: a NULL (or empty) `textCol` explodes to zero word rows, so
    * such docs produce no output row — callers that need a row per
    * doc coalesce the text to '' upstream and left-join the result.
    * logw is an exact decimal: each `ln` is quantized to
    * decimal(20,12) before the subtraction, so per-doc sums have no
    * float-summation-order hazard and compare exactly across engines
    * and partitionings. Callers rank/limit (the paper's Gumbel
    * resampling adds RNG on top of these same weights).
    *
    * Scale shape: two ≤`nBuckets`-row histograms broadcast back, one
    * per-doc (doc, bucket) aggregate, scoring via broadcast join. The
    * internal per-doc feature table stays persisted after return (the
    * returned plan references it lazily, so it cannot be unpersisted
    * here); the CALLER owns the cache — `spark.catalog.clearCache()`
    * or unpersist via the session after materializing, as Verify/Bench
    * do between queries.
    */
  def dsirLogWeights(docs: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, nBuckets: Int): DataFrame = {
    val perDoc = docs
      .select(idCol.as("doc_id"), isTarget.as("is_tgt"),
        explode(TextOps.words(textCol)).as("word"))
      .select(col("doc_id"), col("is_tgt"),
        (TextOps.h31(col("word")) % nBuckets).as("b"))
      .groupBy(col("doc_id"), col("is_tgt"), col("b"))
      .agg(count(lit(1)).cast("decimal(10,0)").as("n"))
      .persist() // feeds both histograms and the scoring join
    // ONE conditional aggregate builds both histograms (round 16,
    // guide §2.3 "aggregate before you shuffle"): the former shape ran
    // two independent groupBy(b) passes over perDoc (raw + target) and
    // left-joined them — two corpus-side aggregation passes and a join
    // exchange for identical output. `ct` sums only target rows (the
    // un-otherwise'd `when` yields null on raw-only rows, which sum
    // skips); buckets with no target rows coalesce to 0 exactly as the
    // old left-join + na.fill did.
    val hist = perDoc.groupBy(col("b")).agg(
      sum(col("n")).cast("long").as("cr"),
      coalesce(sum(when(col("is_tgt"), col("n"))).cast("long"), lit(0L))
        .as("ct"))
    val tots = hist.agg(sum(col("cr")).cast("long").as("tr"),
      sum(col("ct")).cast("long").as("tt"))
    val lw = hist.crossJoin(broadcast(tots)).select(col("b"),
      (log((col("ct") + 1).cast("double") / (col("tt") + nBuckets).cast("double"))
          .cast("decimal(20,12)")
        - log((col("cr") + 1).cast("double") / (col("tr") + nBuckets).cast("double"))
          .cast("decimal(20,12)")).as("dlw"))
    perDoc.join(broadcast(lw), Seq("b"))
      .groupBy(col("doc_id")).agg(sum(col("n") * col("dlw")).as("logw"))
  }
}
