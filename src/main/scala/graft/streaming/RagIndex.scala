package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.operators.Quantizer
import graft.queries.RetrievalQueries

/** Streaming maintenance of the RAG serving index (late round 8) —
  * the [[AnnIndex]] lifecycle applied to the `rag_pipeline` artifact,
  * so ALL THREE of its layouts stay current as documents arrive:
  *
  *  - '''inverted lists''' `(cid, dl, emb)` under `(c_id, slice)`:
  *    each micro-batch is chunked + embedded by the SAME derivation
  *    the batch build uses ([[RetrievalQueries.ragChunksOf]] — a
  *    narrow stage over the batch), coarse-assigned against FROZEN
  *    centroids (train-once under `indexDir/_codebook/cent`, the
  *    FAISS `train()`/`add()` split), and idempotently appended;
  *  - '''postings''' `(word, cid, tf, dl)` under `(pb, slice)`: the
  *    lexical sidecar rides the same single tokenize pass
  *    ([[RetrievalQueries.ragPostingsOf]]) — the term-hash bucketing
  *    keeps serving a literal-partition-filter lookup over a
  *    maintained index too;
  *  - '''corpus stats''': `_stats` holds mergeable `(sid, n, sum_dl)`
  *    PARTIALS (the drift-monitor counts-as-state discipline), one
  *    appended per batch under `(p, slice)`; the `sid` key turns the
  *    partial table into a SET so it compacts and replays with the
  *    same duplicate-tolerant semantics as the other layouts, and
  *    readers dedupe then derive `avgdl = Σsum_dl / Σn` —
  *    bit-identical to the batch build's single-partial case.
  *
  * Crash/replay safety is inherited wholesale from [[Scd2Log]]: a
  * replayed batch dynamic-overwrites its OWN slice in every layout,
  * [[Scd2Log.verifyStreamIdentity]] refuses a fresh checkpoint
  * against an existing index, and [[Scd2Log.compact]] folds a cell's
  * (or bucket's) slices past `compactAfter` with the layout's set
  * semantics (dedupe keys `(cid)` / `(word, cid)`).
  *
  * StreamingSpec proves the IVM statement: after every drop the
  * maintained layouts equal [[batchTwin]] — the batch derivation over
  * the accumulated corpus under the same frozen centroids — and
  * [[graft.queries.RetrievalQueries.ragForget]] composes with the
  * sliced layouts through the same Erasure machinery.
  */
object RagIndex {

  def centPath(indexDir: String) = s"$indexDir/_codebook/cent"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Train-once: persist the IVF centroids from `trainOn(doc_id,
    * text)` unless already present (deterministic in `trainOn`, so a
    * crashed first batch re-trains identically on replay).
    */
  def ensureCentroids(spark: SparkSession, trainOn: DataFrame,
      indexDir: String): Unit =
    if (!exists(spark, centPath(indexDir)))
      Quantizer.trainedCentroids(spark,
          RetrievalQueries.ragChunksOf(trainOn)
            .select(col("cid").as("vec_id"), col("emb")),
          RetrievalQueries.RAG_NC)
        .write.mode("overwrite").parquet(centPath(indexDir))

  /** Launch the index-maintenance stream over `docStream(doc_id,
    * text)`.
    */
  def maintain(docStream: DataFrame, checkpoint: String, indexDir: String,
      trainOn: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
      compactAfter: Int = Scd2Log.DefaultCompactAfter): StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.functions.GraftFunctions.ensureRegistered(spark)
        graft.functions.GraftFunctions.ensureRegistered(trainOn.sparkSession)
        Scd2Log.verifyStreamIdentity(spark, checkpoint, indexDir, "c_id=")
        ensureCentroids(spark, trainOn, indexDir)
        val cent = spark.read.parquet(centPath(indexDir))
        val ce = RetrievalQueries.ragChunksOf(batch).persist()
        val asg = Quantizer
          .assignNearestSlim(spark,
            ce.select(col("cid").as("vec_id"), col("emb")), cent)
          .select(col("vec_id").as("cid"), col("c_id"))
        Scd2Log.withDynamicOverwrite(spark) {
          ce.select(col("cid"), col("dl"), col("emb"))
            .join(asg, Seq("cid"))
            .withColumn("slice", lit(s"b$batchId"))
            .write.mode("overwrite").partitionBy("c_id", "slice")
            .parquet(indexDir)
          RetrievalQueries.ragPostingsOf(ce)
            .withColumn("slice", lit(s"b$batchId"))
            .write.mode("overwrite").partitionBy("pb", "slice")
            .parquet(s"$indexDir/_postings")
          // sid keys the partial (set semantics — see ragStatsOf);
          // the constant p partition level gives the stats table the
          // (partCol, slice) shape Scd2Log.compact folds
          RetrievalQueries.ragStatsOf(ce, s"b$batchId")
            .withColumn("p", lit(0L))
            .withColumn("slice", lit(s"b$batchId"))
            .write.mode("overwrite").partitionBy("p", "slice")
            .parquet(s"$indexDir/_stats")
        }
        // bounded metadata: touched cells ≤ NC, buckets ≤ RAG_PB
        val cells = ce.join(asg, Seq("cid"))
          .select(col("c_id")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val buckets = RetrievalQueries.ragPostingsOf(ce)
          .select(col("pb")).distinct()
          .collect().map(_.getLong(0)).toSeq
        ce.unpersist()
        Scd2Log.compact(spark, indexDir, cells, batchId, compactAfter,
          partCol = "c_id", keyCols = Seq("cid"))
        Scd2Log.compact(spark, s"$indexDir/_postings", buckets, batchId,
          compactAfter, partCol = "pb", keyCols = Seq("word", "cid"))
        // sid-keyed partials are a SET, so the same fold applies —
        // the file count of ALL THREE layouts stays bounded
        Scd2Log.compact(spark, s"$indexDir/_stats", Seq(0L), batchId,
          compactAfter, partCol = "p", keyCols = Seq("sid"))
      }
      .start()

  /** The maintained layouts as DataFrames, slice-deduped (replay and
    * compaction races only ever DUPLICATE rows — keyed rows in every
    * layout, including the sid-keyed stats partials — never diverge
    * them).
    */
  def builtLists(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(indexDir)
      .select(col("cid"), col("dl"), col("emb"), col("c_id"))
      .dropDuplicates(Seq("cid"))

  def builtPostings(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/_postings")
      .select(col("word"), col("cid"), col("tf"), col("dl"), col("pb"))
      .dropDuplicates(Seq("word", "cid"))

  /** Finished (n, avgdl) over the accumulated partials. */
  def builtStats(spark: SparkSession, indexDir: String): DataFrame =
    RetrievalQueries.ragReadStats(spark, indexDir)

  /** The batch derivation over `docs(doc_id, text)` under the SAME
    * frozen centroids — the equivalence target the spec holds
    * [[maintain]] to after every drop: (lists, postings, finished
    * stats).
    */
  def batchTwin(spark: SparkSession, docs: DataFrame,
      indexDir: String): (DataFrame, DataFrame, DataFrame) = {
    val cent = spark.read.parquet(centPath(indexDir))
    val ce = RetrievalQueries.ragChunksOf(docs)
    val asg = Quantizer
      .assignNearestSlim(spark,
        ce.select(col("cid").as("vec_id"), col("emb")), cent)
      .select(col("vec_id").as("cid"), col("c_id"))
    val lists = ce.select(col("cid"), col("dl"), col("emb"))
      .join(asg, Seq("cid"))
    val postings = RetrievalQueries.ragPostingsOf(ce)
    val stats = RetrievalQueries.ragStatsOf(ce)
      .select(col("n").cast("double").as("n"),
        (col("sum_dl").cast("double") / col("n")).as("avgdl"))
    (lists, postings, stats)
  }
}
