package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.operators.Quantizer
import graft.queries.SimilarityQueries

/** Streaming maintenance of the IVF-PQ similarity index (round 7,
  * extending the round-6 IVM pattern from the SCD2 dimension to the
  * ANN family).
  *
  * The batch `sim_ann_ivfpq` builds its index per query; a serving
  * system instead keeps the index CURRENT as embeddings arrive. This
  * is the FAISS lifecycle mapped onto Structured Streaming:
  *
  *  - **train once, offline**: coarse centroids
  *    ([[Quantizer.trainedCentroids]]) and the PQ codebook are trained
  *    on a designated training corpus and FROZEN under
  *    `indexDir/_codebook/` — incremental adds never retrain (exactly
  *    FAISS `train()` then `add()`; retraining is a rebuild, a batch
  *    job);
  *  - **per micro-batch add**: new embeddings are coarse-assigned to
  *    their inverted list and PQ-encoded against the frozen codebooks
  *    — a map-only stage over the batch (both codebooks broadcast) —
  *    then idempotently appended to `indexDir` PARTITIONED BY
  *    (c_id, slice): the inverted lists ARE the partition layout, so
  *    a query probing NPROBE cells reads exactly those directories
  *    (the `sim_ann_ivfpq` 100 TB story, now maintained online);
  *  - same operational amenities as the SCD2 log ([[Scd2Log]]): a
  *    replayed batch dynamic-overwrites its own (c_id, slice)
  *    partitions; [[Scd2Log.verifyStreamIdentity]] refuses a fresh
  *    checkpoint against an existing index; [[Scd2Log.compact]] folds
  *    an inverted list's slices once they exceed `compactAfter`
  *    (dedupe key (vec_id, m) — one code per subspace per vector).
  *
  * StreamingSpec proves the IVM statement: after every drop, the
  * maintained index equals [[batchTwin]] (the one-shot build over the
  * accumulated corpus with the same frozen codebooks), and the
  * `ann_index_build` registry query hash-gates the build itself
  * against DuckDB.
  */
object AnnIndex {

  def centPath(indexDir: String) = s"$indexDir/_codebook/cent"
  def pqPath(indexDir: String) = s"$indexDir/_codebook/pq"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Per-subspace subvectors of `e(vec_id, emb)` — the
    * [[SimilarityQueries.pqTopkPlan]] slicing.
    */
  private def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("emb"),
        explode(typedLit((0 until SimilarityQueries.PQ_M).toList)).as("m"))
      .select(col("vec_id"), col("m"), expr("slice(emb, m*8+1, 8)").as("sub"))

  /** Train-once: persist coarse centroids + PQ codebook from
    * `trainOn(vec_id, emb)` unless already present. Deterministic in
    * `trainOn`, so a crash between the two writes re-trains
    * identically on retry (gated on each path separately).
    */
  def ensureCodebooks(spark: SparkSession, trainOn: DataFrame,
      indexDir: String): Unit = {
    if (!exists(spark, centPath(indexDir)))
      Quantizer.trainedCentroids(spark, trainOn, SimilarityQueries.NC)
        .write.mode("overwrite").parquet(centPath(indexDir))
    if (!exists(spark, pqPath(indexDir)))
      subvectors(trainOn).filter(col("vec_id") < SimilarityQueries.PQ_KS)
        .select(col("m"), col("vec_id").cast("int").as("k"), col("sub").as("cw"))
        .write.mode("overwrite").parquet(pqPath(indexDir))
  }

  /** Index rows for a batch of embeddings with FROZEN codebooks:
    * (vec_id, m, code, c_id) — coarse assignment + PQ codes, both
    * broadcast joins (map-only over the batch).
    */
  def encode(spark: SparkSession, batch: DataFrame, cent: DataFrame,
      cb: DataFrame): DataFrame = {
    val assigned = Quantizer.assignNearestSlim(spark, batch, cent)
      .select(col("vec_id"), col("c_id"))
    SimilarityQueries.pqEncode(subvectors(batch), cb)
      .join(assigned, Seq("vec_id"))
      .select(col("vec_id"), col("m"), col("code"), col("c_id"))
  }

  /** Launch the index-maintenance stream over `embStream(vec_id, emb)`. */
  def maintain(embStream: DataFrame, checkpoint: String, indexDir: String,
      trainOn: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      compactAfter: Int = Scd2Log.DefaultCompactAfter): StreamingQuery =
    embStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // micro-batch sessions are clones, and trainOn may belong to
        // yet another session — plans resolve against the session of
        // the DataFrame they're built from, so register on both
        graft.functions.GraftFunctions.ensureRegistered(spark)
        graft.functions.GraftFunctions.ensureRegistered(trainOn.sparkSession)
        Scd2Log.verifyStreamIdentity(spark, checkpoint, indexDir, "c_id=")
        ensureCodebooks(spark, trainOn, indexDir)
        val cent = spark.read.parquet(centPath(indexDir))
        val cb = spark.read.parquet(pqPath(indexDir))
        val enc = encode(spark, batch, cent, cb).persist()
        Scd2Log.withDynamicOverwrite(spark) {
          enc.withColumn("slice", lit(s"b$batchId"))
            .write.mode("overwrite").partitionBy("c_id", "slice").parquet(indexDir)
        }
        val touched = enc.select(col("c_id")).distinct()
          .collect().map(_.getLong(0)).toSeq
        enc.unpersist()
        Scd2Log.compact(spark, indexDir, touched, batchId, compactAfter,
          partCol = "c_id", keyCols = Seq("vec_id", "m"))
      }
      .start()

  /** The maintained index as a DataFrame (slices deduped — replay and
    * compaction races only ever DUPLICATE rows, never diverge them).
    */
  def builtIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir)
      .select(col("vec_id"), col("m"), col("code"), col("c_id"))
      .dropDuplicates(Seq("vec_id", "m"))

  /** One-shot batch build over `corpus` with the SAME frozen
    * codebooks — the equivalence target the spec holds [[maintain]]
    * to after every drop.
    */
  def batchTwin(spark: SparkSession, corpus: DataFrame,
      indexDir: String): DataFrame =
    encode(spark, corpus,
      spark.read.parquet(centPath(indexDir)),
      spark.read.parquet(pqPath(indexDir)))
}
