package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checked query capability.
  *
  * @param name   stable query id (key in `SparkEntry.queries`)
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables
  *               (bare table names — the driver maps each testdata
  *               parquet to a view of that name). None ⇒ the driver
  *               falls back to a rows-only check.
  * @param build  (session, sfDir) ⇒ result DataFrame. Must be
  *               deterministic: explicit orderBy, round(_,4) on float
  *               aggregates, row_number tie-breaks for dedups — see
  *               SURVEY.md §7.4.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

/** Central inventory: every operator capability from SURVEY.md §2 plus
  * the LLM-data-pipeline extensions, each as a named query + oracle.
  */
object Registry {
  def all: Seq[Q] =
    RefSurface.queries ++
      Extensibility.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      TextQueries.queries ++
      MultimodalQueries.queries ++
      WindowQueries.queries ++
      ScaleQueries.queries ++
      SqlSurface.queries ++
      StatsQueries.queries ++
      BreadthQueries.queries ++
      AsofQueries.queries ++
      PipelineQueries.queries ++
      GraphQueries.queries ++
      RetrievalQueries.queries ++
      PrivacyQueries.queries ++
      FuzzQueries.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  /** Headline bench set (the contract's "headline queries").
    *
    * Why a subset: the driver parses the bench JSON line out of the LAST
    * 2000 chars of captured output. Round 3 registered 71 queries and the
    * full-precision line grew past that window — the driver recorded
    * `parsed: null` and the round had NO perf number. With 103 registered
    * queries a complete line cannot fit at any useful precision, so Bench
    * times this curated set (every perf-relevant family member, all known
    * heavy hitters, one representative of each cheap family) and Verify
    * still gates all 103 for correctness. BenchEmitSpec asserts the
    * worst-case emitted line fits with margin.
    */
  val headline: Seq[String] = Seq(
    // reference surface
    "flagship_enrich", "standardise_books", "enrich_books", "dedup_limit",
    // join_anti/agg_group/json_extract/dedup_limit/... trimmed round 4:
    // sub-second family duplicates; every name costs ~len+11 chars of
    // the 2000-char emit window (BenchEmitSpec)
    // (join_semi trimmed round 6 for multimodal_fusion_dedup — sub-
    // second; the join family keeps join_inner_agg benched)
    "join_inner_agg",
    "sink_roundtrip", "sink_jdbc", "udaf_weighted_avg",
    // dedup family (round 6: dedup_embedding_cosine demoted to
    // Verify-only — it is INTENTIONALLY exact all-pairs (the family's
    // semantics oracle; measured 15.1x wall at 10x data in the scale
    // probe) and a quadratic plan doesn't belong in the perf headline.
    // dedup_semantic is the family's sub-quadratic benched face.)
    // (dedup_substring → dedup_interdoc round 6: interdoc BUILDS the
    // same shared-window structure then adds the doc-level join+agg —
    // a strict cost superset, so it is the benched face; substring
    // stays Verify-gated)
    "dedup_exact", "dedup_interdoc", "dedup_jaccard_pairs", "dedup_minhash_lsh",
    "dedup_clusters", "dedup_keep_best", "dedup_simhash",
    "dedup_semantic",
    // (domain_cap / text_ccnet_buckets stay Verify-only: cap's
    // broadcast+window shape is benched via window_rank_topn, ccnet
    // is one ntile window over the already-benched text_lm_score)
    // similarity (round 6: sim_ann_ivf → sim_ann_binary — ivf's
    // probed-cells scan shape is a subset of the benched sim_ann_ivfpq
    // (cells + ADC), so it stays Verify-gated; binary's slim-code
    // popcount linear scan is a NEW physical shape worth timing)
    "sim_topk_brute", "sim_ann_lsh", "sim_ann_binary", "sim_ann_pq",
    "sim_ann_ivfpq",
    // round 7: the serving path (persisted index + partition-pruned
    // inverted-list lookup) is a NEW physical shape — benched
    "ann_index_query",
    // text analysis (round 6: + text_bpe_tokens — learned-vocab
    // subword tokenization, the family's heaviest member; round 8:
    // + text_bpe_train — the sequential merge-training loop, a NEW
    // physical shape: K argmax rounds over the vocab table; and
    // + text_unigram_train — the OTHER production tokenizer trainer,
    // whose shape is distinct again: per-row unrolled Viterbi DP over
    // the distinct-word table with the scored vocab broadcast each
    // EM round)
    "text_bpe_tokens", "text_bpe_train", "text_unigram_train",
    "text_quality", "text_langid", "text_fingerprint",
    "text_ngram_vocab", "text_repetition", "doc_chunking", "text_bm25",
    "text_lm_score", "text_inverted_index",
    // multimodal (round 6: + multimodal_fusion_dedup — the family's
    // heavy member: trained 128-dim fused quantizer + SemDeDup;
    // caption_topk stays Verify-only, its ADC shape is sim_ann_pq's)
    // (stream_curation_mix stays Verify-only: its dedup + windowed-agg
    // shapes are already benched via dedup_exact / window_tumbling,
    // and the emit window is full)
    "multimodal_decode", "multimodal_features", "multimodal_fusion_dedup",
    // windows
    "window_tumbling", "window_rank_topn", "window_session", "ts_gapfill",
    "events_funnel",
    // round 8 (late): runtime filtering — two NEW physical shapes:
    // the runtime-pruned partitioned fact scan (DynamicPruningSubquery
    // feeding PartitionFilters) and the bloom-filtered shuffle join
    // (might_contain data filter ahead of the exchange)
    "join_dpp", "join_runtime_bloom",
    // scale patterns (round 7: + compact_files — the first addition
    // paid for by the alias emit window, no trim-swap needed)
    "sink_partitioned", "join_skew_salted", "join_bucketed",
    "zorder_cluster", "compact_files", "contamination_check", "pack_sequences",
    // SQL surface
    "sql_tpch_q3", "sql_tpch_q5", "sql_tpch_q6", "sql_tpch_q10",
    "sql_tpch_q18", "agg_tpch_q1", "rollup_agg", "source_json_roundtrip",
    // stats / breadth (round 8: + agg_parquet_stats — footer-only
    // aggregation via parquet aggregate pushdown, benched NEXT TO
    // agg_stats_exact so the headline carries both faces: the full
    // row-decoding scan and the O(files) metadata answer)
    "agg_median", "agg_stats_exact", "agg_parquet_stats", "ddl_catalog",
    // as-of / range (round 5: join_asof + approx_distinct_exact trimmed —
    // each keeps its twin benched (join_asof_native / approx_distinct_kmv)
    // and stays in the Verify correctness gate; freed the emit budget for
    // dedup_semantic + sim_ann_pq)
    // (join_range trimmed with them for sim_ann_ivfpq — same rule)
    "join_asof_native", "join_fuzzy_dict",
    "approx_distinct_kmv",
    // training-data pipeline (round 5: sample_split → dsir_select — the
    // narrow-filter split stays oracle-gated; DSIR's histogram+join
    // shape is the perf-relevant family member. quality_classifier is
    // Verify-gated but NOT benched: the iterative-loop perf shape is
    // already represented by dedup_clusters + graph_pagerank, and the
    // emit window is full)
    "mix_temperature", "dsir_select", "emb_centroids", "merge_upsert",
    // (snapshot_diff trimmed round 8 to fund mv_rewrite_q1 under the
    // emit budget: 0.30 s, and snapshot_timetravel keeps the
    // versioned-snapshot family benched — it drives the publish
    // protocol the diff reads from; snapshot_diff stays Verify-gated)
    "agg_histogram", "dq_expectations", "graph_pagerank",
    // round 7: the alias emit window (benchAlias) ended the zero-sum
    // trim-swap economy, so the queries parked Verify-only in rounds
    // 5-6 PURELY for window space return to the bench: the CMS counter
    // build, the wedge-close triangle join, the SCD2 single-shuffle
    // window build, the attribution window+agg, and the 8-step
    // gradient-descent training loop. (domain_cap / text_ccnet_buckets
    // / sample_bottomk / array_hof stay Verify-only on the ORIGINAL
    // grounds — their shapes are strict subsets of benched queries.)
    "sketch_cms_freq", "graph_triangles", "scd2_history",
    "events_attribution", "quality_classifier",
    // round 7 (late): hybrid RRF fusion — two TakeOrdered legs + a
    // bounded fusion join, a NEW serving shape worth timing.
    // (multimodal_framesample stays Verify-only: its plan is the
    // benched multimodal_decode/features mapPartitions scan in flatMap
    // form — same narrow-map physical shape.)
    "search_hybrid_rrf",
    // round 7 (late): three NEW families, each a distinct perf shape —
    // MMR's K-step bounded-frame loop, the k-anonymity escalation
    // ladder (3 shrinking aggregates + semi-joins), and the snapshot
    // publish lifecycle (two writes + marker commits + two version
    // reads).
    "search_mmr", "privacy_kanon", "snapshot_timetravel",
    // round 7 (late): KL drift — a (source, word) shuffle + MB-scale
    // vocab join, the corpus-monitoring shape. (privacy_ldiversity /
    // privacy_rr_estimate stay Verify-only: low-cardinality scans
    // strictly cheaper than the benched privacy_kanon ladder.)
    "text_kl_drift",
    // round 7 (late): partition backfill — the scheduled-rerun
    // lifecycle (full partitioned write + two dynamic-overwrite
    // repairs + read-back rollup), a write-repair shape nothing else
    // in the headline times.
    "backfill_partition",
    // round 7 (late): right-to-be-forgotten — the targeted-rewrite
    // lifecycle (day-partitioned sink + broadcast deletion list +
    // semi-join partition discovery + anti-join dynamic overwrite).
    // (privacy_ldiversity / privacy_rr_estimate stay Verify-only:
    // cheap scans under the benched privacy_kanon ladder.)
    "privacy_erasure",
    // round 8: the composed RAG flagship — chunk → embed → IVF index
    // lookup → hybrid RRF → MMR, every leg reading the one memoized
    // index artifact; times the full serving path end to end (the
    // build amortizes into the warmup via the corpus-fingerprint memo,
    // mirroring ann_index_query's build/serve split). map_functions
    // stays Verify-only: per-row map ops, a strict subset of benched
    // scan shapes.
    "rag_pipeline",
    // round 8 (continued): the summary-table rewrite serving TPC-H Q1
    // — benched NEXT TO agg_tpch_q1 so the headline carries both faces
    // of the same oracle: the full fact aggregate (tq1) and the
    // optimizer-substituted summary serve (mvq); the gap between the
    // two IS the capability. Build amortizes into warmup via the
    // fact-fingerprint memo, the ann_index_query discipline.
    "mv_rewrite_q1",
    // round 9: positional deletion vectors — the O(deleted rows)
    // delete is the NEW physical shape (metadata-column marking scan
    // + broadcast semi-join + sidecar append, zero data-file writes,
    // read through a broadcast anti-join) and is benched. dv_purge
    // stays Verify-gated by the subsumption rule: its 14-job
    // lifecycle measured 9.9 s of which every component shape is
    // already benched — staging rewrite = compact_files, manifest
    // publish = snapshot_timetravel, vacuum = metadata ops, masked
    // read = dv_delete's — so benching it would time job-count
    // overhead, not a new shape.
    "dv_delete",
    // round 9: the file-skipping sidecar lookup — a NEW physical
    // shape: codegen'd bloom probe over the stats sidecar, then a
    // candidate-files-only scan (the unclustered-key point-lookup
    // path that partition pruning and z-order min/max cannot serve).
    // fuzz_relational_grid stays Verify-only BY DESIGN: it is a
    // 48-leg differential-testing harness, not a plan you'd run at
    // scale — its aggregate shapes are benched via tq1/agg_group.
    "index_point_lookup",
    // round 11: SQL MERGE INTO routed onto the DV table — the one
    // DML statement with a NEW physical shape: an outer join of the
    // positional masked scan against the source with first-match
    // when-chain classification feeding both the tombstone mark and
    // the image append. dv_sql_delete / dv_sql_update stay
    // Verify-only: their physical shapes are dvd's marking scan and
    // the upsert append, both already timed.
    "dv_sql_merge",
    // round 14: the SQL-TRANSPARENT skipping lookup — the serve face
    // users actually hit (plain WHERE key IN (...) through the DSv2
    // catalog, sidecar consulted inside scan planning). A DISTINCT
    // shape from ipl (the API face): scan-planning-time bloom probe +
    // lazy manifest index pruning instead of an explicit candidate
    // list, with the candidate-count assertion running in every rep.
    // Build amortizes via the shared memoized `ipl` table.
    "dv_index_lookup_sql",
    // round 11 (late): the lifecycle DDL statements stay Verify-only
    // by the subsumption rule — dv_sql_restore/dv_sql_history/
    // dv_sql_alter/dv_constraints are metadata-only manifest flips
    // plus scan/aggregate shapes benched everywhere (manifest publish
    // = snapshot_timetravel's lifecycle; the constraint check is one
    // codegen'd aggregate over the batch), and dv_sql_zorder's layout
    // rewrite is zorder_cluster's benched write shape plus dvd's
    // masked scan behind the same CAS publish.
  )

  /** Short stable keys for the bench JSON line (round 7).
    *
    * Why: the driver parses the bench line out of the LAST 2000 chars
    * of captured output, and full query names cost ~name+11 chars each
    * — at 67 headline names the worst-case line ran within 13 chars of
    * BenchEmitSpec's 1800-char bound, so every addition forced a
    * trim-swap (three in round 6 alone). Emitting these 3–4-char codes
    * cuts the worst case to ~1100 chars: ~700 chars of headroom, ≈ 45
    * more queries before the window matters again.
    *
    * Contract: one code per headline name, injective (BenchEmitSpec),
    * STABLE once published — codes are append-only so BENCH_r{N}.json
    * stays comparable across rounds; the full table is documented in
    * BASELINE.md (spec-enforced) and printed to stderr by every bench
    * run. Names outside this map (SPARK_GRAFT_ALL local runs) emit
    * unabbreviated.
    */
  val benchAlias: Map[String, String] = Map(
    "flagship_enrich" -> "fla", "standardise_books" -> "std",
    "enrich_books" -> "enr", "dedup_limit" -> "dlm",
    "join_inner_agg" -> "jin", "sink_roundtrip" -> "srt",
    "sink_jdbc" -> "sjd", "udaf_weighted_avg" -> "uwa",
    "dedup_exact" -> "dex", "dedup_interdoc" -> "did",
    "dedup_jaccard_pairs" -> "dja", "dedup_minhash_lsh" -> "dmh",
    "dedup_clusters" -> "dcl", "dedup_keep_best" -> "dkb",
    "dedup_simhash" -> "dsi", "dedup_semantic" -> "dse",
    "sim_topk_brute" -> "stk", "sim_ann_lsh" -> "sal",
    "sim_ann_binary" -> "sab", "sim_ann_pq" -> "sap",
    "sim_ann_ivfpq" -> "sai", "text_bpe_tokens" -> "tbp",
    "text_quality" -> "tqu", "text_langid" -> "tla",
    "text_fingerprint" -> "tfp", "text_ngram_vocab" -> "tng",
    "text_repetition" -> "tre", "doc_chunking" -> "dch",
    "text_bm25" -> "tbm", "text_lm_score" -> "tlm",
    "text_inverted_index" -> "tii", "multimodal_decode" -> "mmd",
    "multimodal_features" -> "mmf", "multimodal_fusion_dedup" -> "mfd",
    "window_tumbling" -> "wtu", "window_rank_topn" -> "wrk",
    "window_session" -> "wse", "ts_gapfill" -> "tsg",
    "events_funnel" -> "evf", "sink_partitioned" -> "spt",
    "join_skew_salted" -> "jsk", "join_bucketed" -> "jbk",
    "zorder_cluster" -> "zor", "compact_files" -> "cpt",
    "contamination_check" -> "cck",
    "pack_sequences" -> "pks", "sql_tpch_q3" -> "tq3",
    "sql_tpch_q5" -> "tq5", "sql_tpch_q6" -> "tq6",
    "sql_tpch_q10" -> "tq10", "sql_tpch_q18" -> "tq18",
    "agg_tpch_q1" -> "tq1", "rollup_agg" -> "rol",
    "source_json_roundtrip" -> "sjr", "agg_median" -> "amd",
    "agg_stats_exact" -> "ase", "ddl_catalog" -> "ddl",
    "join_asof_native" -> "jas", "join_fuzzy_dict" -> "jfz",
    "approx_distinct_kmv" -> "kmv", "mix_temperature" -> "mxt",
    "dsir_select" -> "dsr", "emb_centroids" -> "emc",
    "merge_upsert" -> "mup", "agg_histogram" -> "ahg",
    "snapshot_diff" -> "snd", "dq_expectations" -> "dqe",
    "graph_pagerank" -> "gpr",
    // round-7 additions (append-only; see the stability contract above)
    "ann_index_query" -> "saq", "sketch_cms_freq" -> "scf",
    "graph_triangles" -> "gtr", "scd2_history" -> "sch",
    "events_attribution" -> "eva", "quality_classifier" -> "qcl",
    "search_hybrid_rrf" -> "shr", "search_mmr" -> "smm",
    "privacy_kanon" -> "pka", "snapshot_timetravel" -> "stt",
    "text_kl_drift" -> "tkd", "backfill_partition" -> "bkf",
    "privacy_erasure" -> "ers",
    // round-8 additions (append-only; see the stability contract above)
    "rag_pipeline" -> "rag", "text_bpe_train" -> "tbt",
    "mv_rewrite_q1" -> "mvq", "text_unigram_train" -> "tut",
    "agg_parquet_stats" -> "aps", "join_dpp" -> "jdp",
    "join_runtime_bloom" -> "jbl",
    // round-9 additions (append-only; see the stability contract above)
    "dv_delete" -> "dvd", "dv_purge" -> "dvp",
    "index_point_lookup" -> "ipl",
    // round-11 additions (append-only; see the stability contract above)
    "dv_sql_merge" -> "dvm",
    // round-14 additions (append-only; see the stability contract above)
    "dv_index_lookup_sql" -> "ils")
}
