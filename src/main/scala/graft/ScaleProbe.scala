package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence probe for the heaviest dedup/ANN operators.
  *
  * The 100 TB arguments in PLANS.md are made from plan shape (equi-join
  * blocking, bounded state, no driver collects); this main turns them
  * into measured datapoints by running the slowest family members on
  * sf0.1 (~5k docs) and on a DERIVED `SPARK_GRAFT_PROBE_SCALE`x corpus
  * (default 10; round 6 runs 100 → 500k docs/embeddings, the regime
  * that actually saturates 32 threads), and printing the wall-clock
  * ratio plus per-run shuffle-write / spill deltas from a task-metrics
  * listener (the "would it spill at scale" evidence PLANS.md cites).
  *
  * The scaled corpus is `scale` replicas of the sf0.1 `documents` table
  * with (a) doc_ids offset per replica and (b) every word salted with
  * the replica tag (`w` -> `w_rK`). The salt keeps replica vocabularies
  * DISJOINT, so the near-dup pair structure of each replica equals the
  * original corpus (output ~scale x, candidate blocks scale linearly) —
  * a clean throughput probe, not a pathological all-duplicates blow-up.
  * Derived data is written under /tmp, never into the read-only
  * testdata tree.
  *
  * Env knobs: SPARK_GRAFT_PROBE_SCALE (replica count, default 10),
  * SPARK_GRAFT_PROBE_TARGETS (csv of query names, default = the full
  * round-5 list), SPARK_GRAFT_PROBE_PARTITIONS (shuffle partitions,
  * default = cpu count — the scale-out lever), SPARK_GRAFT_PROBE_REUSE
  * (=1: reuse an existing scaled dir instead of rebuilding — both an
  * iteration-speed and a measurement-hygiene lever, see below).
  */
object ScaleProbe {

  /** Cross-query task-metrics totals; the probe reports per-run deltas. */
  private final class MetricsListener extends SparkListener {
    val spillMem = new AtomicLong
    val spillDisk = new AtomicLong
    val shuffleWrite = new AtomicLong
    val peakExecMem = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        peakExecMem.accumulateAndGet(m.peakExecutionMemory,
          (a: Long, b: Long) => math.max(a, b))
      }
    }
    def snapshot: (Long, Long, Long) =
      (spillMem.get(), spillDisk.get(), shuffleWrite.get())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "10").toInt
    val scaledDir = s"/tmp/graft_scale$scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition override: the production lever a real cluster
    // pulls as data grows (AQE coalesces back down for cheap stages).
    // The probe exposes it so "would more partitions absorb the spill"
    // is a measurement, not an argument.
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      // UTC everywhere (the Tables.normalizeTs docstring's claim):
      // scaled-events replicas written by this probe on a non-UTC host
      // must carry the same instants a UTC run would produce
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new MetricsListener
    spark.sparkContext.addSparkListener(metrics)

    // SPARK_GRAFT_PROBE_REUSE=1 skips rebuilding the scaled tables when
    // the scaled dir already exists. Beyond iteration speed, this is a
    // measurement-hygiene knob: the ~GBs of scaled-table writes churn
    // the page cache and IO queues, and timed runs taken immediately
    // after them read 3-25x inflated (observed on the runtime-filter
    // probe: join_dpp's memoized serve timed 18.5s mid-churn vs 1.0s
    // re-measured idle, same commit, same dirs). Rebuild once, then
    // re-run targets with REUSE=1 on a quiet host.
    val reuse = sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1") &&
      new java.io.File(s"$scaledDir/documents.parquet").exists()
    if (reuse) System.err.println(s"[probe] reusing scaled tables in $scaledDir")

    if (!reuse) {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = base.agg(max(col("doc_id"))).head.getLong(0) + 1
    val scaled = (0 until scale).map { k =>
      base.withColumn("doc_id", col("doc_id") + lit(k * maxId))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_r$k"))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")
    val n0 = base.count(); val n1 = spark.read.parquet(s"$scaledDir/documents.parquet").count()
    System.err.println(s"[probe] corpus: $n0 docs -> $n1 docs")

    // Scaled embeddings: replica k gets a SIGNED PERMUTATION of the
    // dimensions (cyclic shift by 7k mod 64 plus a sign flip on bit
    // (k % 6) of the dimension index, offset by k's parity). A signed
    // permutation is orthogonal: intra-replica dot products (and so
    // every cosine the dedup/ANN queries compute) are preserved
    // EXACTLY, while cross-replica cosines decorrelate to ~0 on this
    // near-orthogonal corpus. Distinctness across ANY two replicas
    // k < k' <= 192: if the shifts collide (k' = k + 64) the flip bits
    // (k % 6 vs (k+4) % 6) differ, so no two replicas are exact
    // duplicates of each other — no cross-replica duplicate blow-up.
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxVid = embBase.agg(max(col("vec_id"))).head.getLong(0) + 1
    val embScaled = (0 until scale).map { k =>
      val shift = (7 * k) % 64
      embBase.withColumn("vec_id", col("vec_id") + lit(k * maxVid))
        .withColumn("embedding", expr(
          s"""transform(sequence(0, 63), i ->
             |  CAST(CASE WHEN (shiftright(i, ${k % 6}) + $k) % 2 = 0
             |            THEN 1.0 ELSE -1.0 END
             |       * element_at(embedding, ((i + $shift) % 64) + 1) AS FLOAT))"""
            .stripMargin))
    }.reduce(_ unionByName _)
    embScaled.write.mode("overwrite").parquet(s"$scaledDir/embeddings.parquet")
    System.err.println(s"[probe] embeddings: $maxVid vecs -> ${maxVid * scale} vecs")

    // Scaled events: replica k offsets user_id and event_id; the
    // timestamps are left unchanged, so each replica's per-user
    // orderings, sessions and validity intervals equal the original's
    // exactly (users are disjoint across replicas ⇒ window/SCD2/
    // transition outputs scale linearly by construction) — the events
    // family's analog of the disjoint-vocabulary document replicas.
    val evBase = graft.sources.Tables.events(spark, sfDir)
    val maxUid = evBase.agg(max(col("user_id"))).head.getLong(0) + 1
    val maxEid = evBase.agg(max(col("event_id"))).head.getLong(0) + 1
    val evScaled = (0 until scale).map { k =>
      evBase.withColumn("user_id", col("user_id") + lit(k * maxUid))
        .withColumn("event_id", col("event_id") + lit(k * maxEid))
    }.reduce(_ unionByName _)
    evScaled.write.mode("overwrite").parquet(s"$scaledDir/events.parquet")
    System.err.println(s"[probe] events: ${evBase.count()} -> ${spark.read.parquet(s"$scaledDir/events.parquet").count()} rows")

    // Scaled lineitem (round 8, continued): replicas offset l_orderkey
    // ONLY — every grain column (l_returnflag, l_linestatus,
    // l_shipdate) is unchanged, so the Q1 summary's cardinality is
    // CONSTANT across scale. That invariance is the claim the
    // mv_rewrite probe tests: the base aggregate's cost grows with the
    // fact, the summary serve's with the grain.
    //
    // Scaled orders (round 8, late) shares ONE orderkey offset with
    // lineitem — max over BOTH tables' key domains — so replica k of
    // lineitem joins exactly replica k of orders and the fact⋈orders
    // joins (runtime-filter probes) stay 1:1 per replica with no
    // cross-replica key collisions. o_orderpriority is untouched, so
    // the DPP fact keeps exactly 5 partitions at every scale.
    val liBase = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ordBase = spark.read.parquet(s"$sfDir/orders.parquet")
    val maxOk = math.max(
      liBase.agg(max(col("l_orderkey"))).head.getLong(0),
      ordBase.agg(max(col("o_orderkey"))).head.getLong(0)) + 1
    val liScaled = (0 until scale).map { k =>
      liBase.withColumn("l_orderkey", col("l_orderkey") + lit(k * maxOk))
    }.reduce(_ unionByName _)
    liScaled.write.mode("overwrite").parquet(s"$scaledDir/lineitem.parquet")
    System.err.println(s"[probe] lineitem: ${liBase.count()} -> ${spark.read.parquet(s"$scaledDir/lineitem.parquet").count()} rows")
    val ordScaled = (0 until scale).map { k =>
      ordBase.withColumn("o_orderkey", col("o_orderkey") + lit(k * maxOk))
    }.reduce(_ unionByName _)
    ordScaled.write.mode("overwrite").parquet(s"$scaledDir/orders.parquet")
    System.err.println(s"[probe] orders: ${ordBase.count()} -> ${spark.read.parquet(s"$scaledDir/orders.parquet").count()} rows")
    } // end !reuse: scaled-table builds

    // dedup_semantic probes with the quantizer the corpus size calls
    // for: SemDeDup's cost is assignment (n*NC cosines, brute-force
    // against a broadcast codebook) + within-cell pairs (~n²/NC), so a
    // FIXED NC turns the pair term quadratic by construction — the
    // production lever is growing the codebook with the corpus. NC ∝
    // √n balances the two brute-force terms (total work ∝ n^1.5);
    // NC ∝ n (the SemDeDup paper's constant cell size) is better still
    // but needs an ANN-assisted assignment to keep the n*NC term from
    // dominating — exactly what `sim_ann_ivf*` demonstrate. The probe
    // reports the √n point and PLANS.md carries the argument.
    val semNcBase = 16 // = DedupQueries.SEM_NC at sf0.1
    val semEps = 0.35 // = DedupQueries.SEM_EPS
    def semanticAt(nc: Int)(s: SparkSession, dir: String): DataFrame = {
      val e = graft.sources.Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cent = graft.operators.Quantizer.trainedCentroids(s, e, nc)
      graft.operators.Dedup.semanticDedup(s, e, cent, semEps)
    }
    val semNcScaled = math.max(semNcBase,
      (semNcBase * math.sqrt(scale.toDouble)).round.toInt)
    val semanticScaled: (SparkSession, String) => DataFrame = (s, dir) =>
      semanticAt(if (dir == scaledDir) semNcScaled else semNcBase)(s, dir)

    val defaultTargets = Seq(
      "dedup_jaccard_pairs", "dedup_simhash", "dedup_clusters",
      "dedup_clusters_star", "dedup_minhash_lsh",
      "dedup_embedding_cosine", "dedup_semantic", "sim_ann_pq",
      "sim_ann_ivfpq", "dsir_select",
      // round 6 additions: the 1-bit code linear scan (cost ∝ n per
      // query — the probe checks the slim-scan claim), the CMS
      // counter build (fixed 4×1024 state regardless of corpus/vocab),
      // and triangle counting (disjoint replica vocabularies ⇒ the
      // graph is `scale` disjoint copies: wedge/triangle structure
      // grows exactly linearly — a clean throughput probe for the
      // two-join wedge-close plan)
      "sim_ann_binary", "sketch_cms_freq", "graph_triangles",
      // events-family coverage (scaled via disjoint user replicas):
      // the SCD2 single-shuffle window build, the native session
      // aggregation, and the attribution window+agg
      "scd2_history", "window_session_native", "events_attribution",
      // round 7 additions: the ANN serving path (index REBUILD +
      // partition-pruned lookup — the probe times the whole lifecycle;
      // at scale the rebuild amortizes across queries but the probe
      // deliberately charges it) and hybrid RRF (two TakeOrdered legs
      // whose cost is corpus-scan-bound, fusion O(NCAND) regardless of
      // corpus size). compact_files is NOT probed: the scaled dir
      // carries only documents/embeddings/events, and its one-shuffle
      // cost ∝ bytes is already the sink_partitioned shape.
      "ann_index_query", "search_hybrid_rrf",
      // round 7 (late): MMR — the K-step greedy's cost claim is that
      // ONLY the candidate scan sees the corpus (step frames bounded
      // at NQ×NCAND), so wall should track the brute top-N scan, not
      // the loop. (privacy_kanon / snapshot_timetravel are not
      // probed: they read customer, which the scaled dir doesn't
      // carry, and their costs are resp. three low-cardinality
      // aggregates and two parquet writes — shapes already probed.)
      "search_mmr",
      // round 7 (late): KL drift — the (source, word) count shuffle
      // grows with the corpus AND (here) the vocabulary (replica words
      // are suffixed ⇒ vocab ×scale, the worst case for the
      // vocab-sized join-back); source count stays 20 ⇒ rows_ratio=1.
      // (privacy_ldiversity / privacy_rr_estimate are not probed:
      // customer-table scans with low-cardinality aggregates, strict
      // subsets of already-probed shapes. backfill_partition reads
      // orders, which the scaled dir doesn't carry; its cost shape —
      // partitioned writes + dynamic overwrite — IS probed below via
      // the erasure lifecycle.)
      "text_kl_drift",
      // round 7 (late): the erasure lifecycle end-to-end (full
      // day-partitioned sink write + victim discovery semi-join +
      // anti-join rewrite of affected partitions). The sink write
      // scales with the corpus by construction; the probe's claim
      // under test is that the ERASE phase stays
      // O(victims + affected partitions), so total wall tracks the
      // two writes, not the deletion list. rows_ratio = 1.0 (5 event
      // types at any scale).
      "privacy_erasure",
      // round 8: the composed RAG serving path. The per-dir index
      // build is forced OUTSIDE the timed runs (below) because the
      // memo amortizes it across queries in production —
      // ann_index_query's row deliberately charges its lifecycle;
      // this row probes the other face: the LOOKUP's corpus
      // dependence (probed-cell scan ∝ chunks·NPROBE/NC + the
      // lexical stats scan ∝ chunks; everything after the top-NCAND
      // gates is bounded). On the salted scaled corpus the literal
      // query terms match nothing, so the lexical leg tops zero rows
      // — the timed stats SCAN still runs in full, which is the
      // cost under test; fusion degrades to the semantic leg, rows
      // stay K (rows_ratio 1.0).
      "rag_pipeline",
      // round 8 (late): sequential BPE merge training. The claim
      // under test: only the initial word-frequency groupBy is
      // corpus-sized; the K merge rounds run over the distinct-word
      // table (the salted corpus multiplies the vocab by `scale`,
      // the exact dimension rounds depend on). rows_ratio = 1.0
      // (always K merge rows).
      "text_bpe_train",
      // round 8 (late): unigram-LM (SentencePiece) training, the
      // sibling trainer. Same claim, different mechanism: the
      // corpus-sized op is the word-frequency groupBy; both EM rounds
      // run over the distinct-word table (salted corpus ⇒ vocab ×
      // scale — the adversarial case for the per-round broadcast of
      // the scored vocab and the span pivot). rows_ratio = 1.0
      // (always UNI_OUT=24 output rows).
      "text_unigram_train",
      // round 8 (continued): the summary-table rewrite, probed as a
      // PAIR. agg_tpch_q1 is the base fact aggregate — its wall must
      // grow with the fact; mv_rewrite_q1 answers the same oracle from
      // the grain summary (serve face; the build memoizes per fact
      // fingerprint and is forced outside the timed runs below), so
      // its wall must stay ~flat while the fact grows `scale`x. The
      // GAP between the two rows is the capability. rows_ratio = 1.0
      // for both (grain cardinality is scale-invariant by
      // construction of the scaled lineitem).
      "agg_tpch_q1", "mv_rewrite_q1",
      // round 8 (late): footer-only aggregation, probed as the THIRD
      // face beside the tq1/mvq pair — same claim (an O(rows) scan
      // vs a metadata-sized answer) but with zero maintained state:
      // agg_stats_exact decodes every row group and must grow with
      // the fact; agg_parquet_stats reads footers and must stay
      // ~flat (O(files): the scaled dir has `scale`x the files but
      // none of the row-decoding). rows_ratio = 1.0 for both.
      "agg_stats_exact", "agg_parquet_stats",
      // round 8 (late): runtime filtering, with the scaled orders
      // table sharing lineitem's orderkey offset. join_dpp's sink
      // write memoizes per dir and is forced outside the timed runs
      // (below) — the timed face is the runtime-PRUNED join, the
      // serving claim. join_runtime_bloom is probed as an ON/OFF
      // PAIR over the identical shuffle join: the bloom filter's
      // value is the measured shuffle-write delta at scale, not the
      // wall clock (building + applying the filter costs time; the
      // shuffle bytes it saves are what explode at 100 TB).
      "join_dpp", "join_runtime_bloom", "join_runtime_bloom_off")
    val names = sys.env.get("SPARK_GRAFT_PROBE_TARGETS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(defaultTargets)
    // populate rag's per-dir index memo before timing (see above)
    if (names.contains("rag_pipeline")) {
      System.err.println("[probe] pre-building rag index for the scaled dir")
      SparkEntry.queries("rag_pipeline")(spark, scaledDir)
        .write.format("noop").mode("overwrite").save()
    }
    // populate the dpp sink memo per dir before timing (serve face)
    if (names.contains("join_dpp")) {
      System.err.println("[probe] pre-building dpp sinks per dir")
      Seq(sfDir, scaledDir).foreach { d =>
        SparkEntry.queries("join_dpp")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // populate the summary memo per dir before timing (serve face)
    if (names.contains("mv_rewrite_q1")) {
      System.err.println("[probe] pre-building the Q1 summary per dir")
      Seq(sfDir, scaledDir).foreach { d =>
        SparkEntry.queries("mv_rewrite_q1")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    val targets: Seq[(String, (SparkSession, String) => DataFrame)] =
      names.map {
        case "dedup_semantic" =>
          s"dedup_semantic(nc=$semNcBase->$semNcScaled)" -> semanticScaled
        // shard_epoch's output is a pure REORDER (window rank + sort):
        // under the probe's count() action Catalyst prunes the window
        // and eliminates the sort, measuring only the scan (an
        // aggregate checksum gets pruned the same way — count() needs
        // no aggregate VALUES). A filter ON the rank keeps the window
        // on the counted path; the final presentation sort is still
        // elided, which is right — the probe times the sharding work
        // (hash + exchange + per-shard sort), the oracle gates the
        // order. rows_ratio stays ~scale (every 97th position).
        case "shard_epoch" =>
          "shard_epoch(pos%97)" -> ((s: SparkSession, dir: String) =>
            SparkEntry.queries("shard_epoch")(s, dir)
              .filter(pmod(col("pos"), lit(97)) === 0))
        case "join_runtime_bloom_off" =>
          "join_runtime_bloom(off)" -> ((s: SparkSession, dir: String) =>
            graft.queries.ScaleQueries.runtimeBloomJoin(s, dir,
              bloom = false))
        case n => n -> SparkEntry.queries(n)
      }

    targets.foreach { case (name, fn) =>
      def run(dir: String): (Double, Long, String) = {
        spark.catalog.clearCache()
        val (sm0, sd0, sw0) = metrics.snapshot
        val t0 = System.nanoTime()
        // timed action = noop-sink write (full column production; a
        // count() lets Catalyst prune agg values/projections/windows
        // and times a partial plan — the round-7 shard_epoch lesson,
        // PLANS.md); rows for the ratio check come from an UNTIMED
        // count afterwards (cheap by the same pruning)
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        val (sm1, sd1, sw1) = metrics.snapshot
        val rows = fn(spark, dir).count()
        def mb(b: Long) = f"${b / 1024.0 / 1024.0}%.0fMB"
        (secs, rows,
          s"shufW=${mb(sw1 - sw0)} spillMem=${mb(sm1 - sm0)} spillDisk=${mb(sd1 - sd0)}")
      }
      val (warm, _, _) = run(sfDir) // absorb codegen/JIT once per query
      val (t1, r1, m1) = run(sfDir)
      val (tN, rN, mN) = run(scaledDir)
      System.err.println(
        f"[probe] $name%-34s sf0.1: $t1%7.2fs ($r1 rows, warmup=$warm%.2fs, $m1)  ${scale}x: $tN%7.2fs ($rN rows, $mN)  ratio=${tN / t1}%.1fx  rows_ratio=${rN.toDouble / r1}%.1fx")
    }
    System.err.println(
      f"[probe] peak per-task execution memory high-water: ${metrics.peakExecMem.get() / 1024.0 / 1024.0}%.0f MB")
    spark.stop()
  }
}
