package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** Text-analysis query family over `documents`: token counting,
  * quality scoring, language ID, fingerprinting. All pure narrow
  * transformations (no shuffle except the final language-ID rollup) —
  * at 100 TB these run as one codegen'd scan stage per partition.
  */
object TextQueries {

  /** Token counting: whitespace tokens and regex ("BPE-ish"
    * `[a-z0-9]+` runs) tokens per document.
    */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(TextOps.words(col("text"))).as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_re_tokens"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  private val tokensOracle =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_re_tokens,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  private[queries] val stopwords = TextOps.stopwords

  // ---- BPE subword tokenization ----------------------------------------

  private val BPE_VOCAB = 64 // learned multi-char subword tokens

  /** Subword token accounting with a LEARNED vocabulary — the real
    * token counting an LLM pipeline runs (the whitespace + regex
    * counts in [[tokens]] are the cheap proxies). Three stages, all
    * deterministic and replayed verbatim by the DuckDB oracle:
    *
    *  1. VOCAB LEARNING: candidate tokens = every within-word
    *     character n-gram of length 2..[[graft.functions.BpeEncode.MaxTokenLen]],
    *     weighted by word occurrence frequency; vocab = top-[[BPE_VOCAB]]
    *     under the total order (weight DESC, length DESC, token ASC).
    *     This is the frequency-merge spirit of BPE (Sennrich 2016)
    *     collapsed to one pass: instead of m sequential pair merges,
    *     rank all multi-char candidates at once — every stage stays a
    *     hash aggregate (no m-round driver loop at 100 TB).
    *  2. ENCODING: greedy longest-match per DISTINCT word via the
    *     native codegen'd [[graft.functions.BpeEncode]] expression
    *     (dictionary encoding — each distinct word is encoded once,
    *     occurrences join the result; the vocab rides along as a
    *     broadcast one-row array).
    *  3. ACCOUNTING: per-doc word and subword-token counts plus the
    *     corpus grand total in one ROLLUP aggregate.
    *
    * The oracle replays the greedy scan with a recursive CTE over
    * (word, position) states — possible at oracle scale because the
    * state space is DISTINCT WORDS x positions, not corpus tokens.
    * Round-trip decode (concat(tokens) == word) is pinned in BpeSpec.
    */
  def bpeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val maxL = graft.functions.BpeEncode.MaxTokenLen
    val docWords = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
    // distinct words + occurrence counts: feeds vocab learning AND the
    // dictionary-encoding join
    val wf = docWords.groupBy(col("w")).agg(count(lit(1)).as("freq")).persist()
    val cand = wf
      .select(col("w"), col("freq"),
        explode(expr(s"sequence(2, $maxL)")).as("L"))
      .filter(length(col("w")) >= col("L"))
      .select(col("w"), col("freq"), col("L"),
        explode(expr("sequence(1, length(w) - L + 1)")).as("st"))
      .select(expr("substring(w, st, L)").as("tok"), col("freq"))
    val vocab = cand.groupBy(col("tok"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, length(col("tok")).desc, col("tok"))
      .limit(BPE_VOCAB)
    val varr = vocab.agg(collect_list(col("tok")).as("vocab"))
    val wenc = wf.crossJoin(broadcast(varr))
      .select(col("w"),
        size(graft.functions.GraftFunctions.bpeEncode(
          spark, col("w"), col("vocab"))).as("ntok"))
    docWords.join(wenc, Seq("w"))
      .rollup(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  private val bpeOracle = {
    val maxL = graft.functions.BpeEncode.MaxTokenLen
    s"""WITH RECURSIVE dw AS (
       |  SELECT doc_id, unnest(${TextOps.wordsSql}) AS w FROM documents),
       |wf AS (SELECT w, count(*) AS freq FROM dw GROUP BY w),
       |cand AS (
       |  SELECT substr(w, t.st, l.L) AS tok, freq
       |  FROM wf,
       |       generate_series(2, $maxL) AS l(L),
       |       unnest(generate_series(1, len(w) - l.L + 1)) AS t(st)
       |  WHERE len(w) >= l.L),
       |cnts AS (SELECT tok, CAST(sum(freq) AS BIGINT) AS cnt
       |         FROM cand GROUP BY tok),
       |vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok,
       |      row_number() OVER (ORDER BY cnt DESC, len(tok) DESC, tok) AS rn
       |    FROM cnts) WHERE rn <= $BPE_VOCAB),
       |mt AS (
       |  SELECT wf.w, t.pos, max(l.L) AS bl
       |  FROM wf,
       |       generate_series(2, $maxL) AS l(L),
       |       unnest(generate_series(1, len(w) - l.L + 1)) AS t(pos)
       |  WHERE len(wf.w) >= l.L
       |    AND substr(wf.w, t.pos, l.L) IN (SELECT tok FROM vocab)
       |  GROUP BY wf.w, t.pos),
       |rec(w, pos, ntok) AS (
       |  SELECT w, 1, 0 FROM wf
       |  UNION ALL
       |  SELECT rec.w, rec.pos + COALESCE(mt.bl, 1), rec.ntok + 1
       |  FROM rec LEFT JOIN mt ON mt.w = rec.w AND mt.pos = rec.pos
       |  WHERE rec.pos <= len(rec.w)),
       |wenc AS (SELECT w, ntok FROM rec WHERE pos > len(w))
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(ntok) AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN wenc USING (w)
       |GROUP BY ROLLUP(doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- BPE merge training (the sequential Sennrich loop) ---------------

  private[graft] val BPE_MERGES = 10 // learned merge rules

  /** BPE merge-rule TRAINING in-engine — the faithful sequential
    * algorithm (Sennrich, Haddow & Birch, ACL 2016 §3.2), complementing
    * [[bpeTokens]]'s deliberately loop-free one-pass ranking: K rounds,
    * each counting adjacent symbol pairs weighted by word frequency,
    * merging the argmax pair everywhere, and repeating on the updated
    * symbol table. Output = the learned merge list
    * (merge_rank, lhs, rhs, merged, cnt).
    *
    * 100 TB shape — the reason industrial tokenizer trainers scale:
    * the ONLY corpus-sized operation is the initial word-frequency
    * groupBy (one map-side-combined shuffle). Every merge round runs
    * over the DISTINCT-WORD table (Heaps' law: ~10⁶–10⁷ rows at 100 TB,
    * thousands of times smaller than the corpus), so round cost is
    * corpus-independent. The per-round argmax stays a broadcast ONE-ROW
    * frame — no driver collect anywhere; `localCheckpoint` pins each
    * round's state so the K-step lineage stays flat (the
    * [[RetrievalQueries.searchMmr]] loop discipline).
    *
    * Symbol-table representation: each word's current symbols joined by
    * DOUBLED pipe delimiters with pipe sentinels at both ends
    * (`"low" → "||l||o||w||"`; the corpus alphabet is `[a-z ]`, so `|`
    * is free). Merging pair (a,b) is then one non-regex
    * `replace(sym, "|a||b|", "|ab|")`: each boundary contributes one
    * `|` to the match and keeps one, so consecutive occurrences
    * (`a b a b`) all merge while overlapping ones (`a a a` under
    * (a,a)) merge left-to-right non-overlapping — exactly the
    * reference implementation's regex-sub semantics, and identical in
    * Spark and DuckDB (both replace non-overlapping left-to-right).
    * BpeSpec cross-checks the whole training run against an
    * independent in-JVM fold-based reimplementation.
    */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val wf = Tables.documents(spark, sfDir)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var vf = wf.select(
      concat(lit("||"), regexp_replace(col("w"), "(.)", "$1||")).as("sym"),
      col("freq")).localCheckpoint(true)
    var merges: DataFrame = null
    for (r <- 1 to BPE_MERGES) {
      // best STAYS eagerly checkpointed (round-16 measured dead end:
      // dropping the checkpoint to save one job per round — best
      // evaluated lazily inside vf's checkpoint as the broadcast
      // build, re-derived by the final merges job — ran 2.70 → 3.49 s
      // min-of-7 interleaved A/B, slower in every rep; the duplicated
      // aggregate + TakeOrdered per round costs more than the job
      // overhead the fused shape saves)
      val best = vf
        .select(col("freq"),
          filter(split(col("sym"), "\\|\\|"), x => x =!= "").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("freq"), col("ts"),
          explode(expr("sequence(1, size(ts) - 1)")).as("i"))
        .select(element_at(col("ts"), col("i")).as("lhs"),
          element_at(col("ts"), col("i") + 1).as("rhs"), col("freq"))
        .groupBy(col("lhs"), col("rhs")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1)
        .select(lit(r).as("merge_rank"), col("lhs"), col("rhs"), col("cnt"))
        .localCheckpoint(true) // ONE row: this round's winning pair
      merges = if (merges == null) best else merges.union(best)
      vf = vf.crossJoin(broadcast(best))
        .select(
          replace(col("sym"),
            concat(lit("|"), col("lhs"), lit("||"), col("rhs"), lit("|")),
            concat(lit("|"), col("lhs"), col("rhs"), lit("|"))).as("sym"),
          col("freq"))
        .localCheckpoint(true)
    }
    merges
      .select(col("merge_rank"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
      .orderBy(col("merge_rank"))
  }

  /** The same K rounds unrolled as CTE chains. Every `v{r}` is
    * referenced twice (next round's pair count + next round's replace)
    * and every `b{r}` twice (the replace + the final union) — all
    * MATERIALIZED, or DuckDB's default inlining re-expands the whole
    * chain exponentially (the `rag_pipeline` 200 GB lesson).
    */
  private val bpeTrainOracle: String = {
    val rounds = (1 to BPE_MERGES).map { r =>
      s"""p$r AS (
         |  SELECT ts[i] AS lhs, ts[i + 1] AS rhs,
         |    CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT list_filter(string_split(sym, '||'), x -> x <> '') AS ts,
         |          freq
         |        FROM v${r - 1}),
         |       unnest(generate_series(1, len(ts) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |b$r AS MATERIALIZED (
         |  SELECT lhs, rhs, cnt FROM p$r ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT replace(sym, '|' || lhs || '||' || rhs || '|',
         |                 '|' || lhs || rhs || '|') AS sym, freq
         |  FROM v${r - 1}, b$r)"""
        .stripMargin
    }.mkString(",\n")
    val union = (1 to BPE_MERGES).map(r =>
      s"SELECT CAST($r AS INT) AS merge_rank, lhs, rhs, cnt FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""WITH dw AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wf AS (SELECT w, count(*) AS freq FROM dw GROUP BY w),
       |v0 AS MATERIALIZED (
       |  SELECT '||' || regexp_replace(w, '(.)', '\\1||', 'g') AS sym, freq
       |  FROM wf),
       |$rounds
       |SELECT merge_rank, lhs, rhs, lhs || rhs AS merged, cnt FROM (
       |  $union)
       |ORDER BY merge_rank""".stripMargin
  }

  // ---- Unigram-LM tokenizer training (Viterbi hard-EM) -----------------

  private[graft] val UNI_W = 8 // max word length trained on
  private[graft] val UNI_P = 3 // max piece length
  private[graft] val UNI_K = 2 // EM rounds
  private[graft] val UNI_OUT = 24 // emitted vocabulary size

  /** All legal (start, end) piece spans over ≤[[UNI_W]]-char words. */
  private val uniSpans: Seq[(Int, Int)] =
    for { i <- 1 to UNI_W; j <- math.max(0, i - UNI_P) until i } yield (j, i)

  /** Unigram-LM tokenizer TRAINING (Kudo, ACL 2018 — the SentencePiece
    * algorithm) beside [[bpeTrain]]: together they are the two
    * production tokenizer trainers (merge-based and
    * likelihood-prune-based). Where BPE grows a vocabulary bottom-up
    * by merging, unigram starts from a LARGE candidate set (here: all
    * ≤[[UNI_P]]-char substrings of ≤[[UNI_W]]-char corpus words,
    * seeded with frequency scores) and re-estimates by EM: each round
    * Viterbi-segments every distinct word under the current piece
    * log-probabilities (hard EM — the deterministic variant of Kudo's
    * forward-backward soft counts, chosen because an oracle must
    * replay it bit-for-bit), counts the pieces the best segmentations
    * actually use, and re-scores; multi-char pieces whose count drops
    * to zero are pruned, single chars survive with add-one floors
    * (Kudo's coverage guarantee — a vocabulary must be able to spell
    * every word). Output: the top [[UNI_OUT]] pieces by final weight.
    *
    * Determinism is the design driver and uses the house rules end to
    * end: scores are `ln(cnt/total)` QUANTIZED ONCE to DECIMAL(20,12)
    * (the `text_lm_score` rule), Viterbi compares exact decimal sums
    * (order-free), DP ties prefer the SHORTER final piece (the
    * backpointer CASE checks j = i−1 first — identical clause order in
    * both engines), and the final ranking breaks weight ties by
    * (longer piece, lexicographic). The per-word DP is UNROLLED over
    * the [[UNI_W]] positions as plain column expressions — no UDF, no
    * driver loop over data; the oracle generates the same unrolled
    * SQL programmatically, with every round's vocabulary MATERIALIZED
    * (the CTE-inlining lesson).
    *
    * 100 TB shape: like [[bpeTrain]], the only corpus-sized operation
    * is the word-frequency groupBy; every EM round runs over the
    * DISTINCT-WORD table (Heaps'-law bounded) with the piece
    * vocabulary broadcast (≤ |alphabet|^[[UNI_P]] entries), and each
    * round is one narrow projection + one map-side-combinable count —
    * round cost is corpus-independent, the property that makes
    * industrial tokenizer training tractable.
    */
  def unigramTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, weights) = uniTrained(spark, sfDir)
    val rankW = Window.orderBy(col("cnt").desc,
      length(col("tok")).desc, col("tok"))
    weights
      .select(row_number().over(rankW).as("rank"), col("tok"),
        length(col("tok")).as("tok_len"), col("cnt"))
      .filter(col("rank") <= UNI_OUT)
      .orderBy(col("rank"))
  }

  /** Quantized log-prob scores of a weight table — the ONE quantization
    * point both engines share (`ln(cnt/total)` → DECIMAL(20,12)).
    */
  private def uniScored(weights: DataFrame): DataFrame = {
    val tot = weights.agg(sum(col("cnt")).cast("double").as("tot"))
    weights.crossJoin(broadcast(tot))
      .select(col("tok"),
        log(col("cnt").cast("double") / col("tot"))
          .cast("decimal(20,12)").as("s"))
  }

  /** The hard-EM training loop shared by [[unigramTrain]] (which ranks
    * the final weights) and [[unigramTokens]] (which segments the
    * corpus under them). Returns (distinct-word-freq table, final
    * piece weights), both checkpointed.
    */
  private def uniTrained(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    val wf = Tables.documents(spark, sfDir)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .filter(length(col("w")).between(1, UNI_W))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq"))
      .localCheckpoint(true)

    // seed weights: per-occurrence substring counts, freq-weighted
    val cand0 = wf
      .select(col("w"), col("freq"),
        explode(expr(s"sequence(1, $UNI_P)")).as("L"))
      .filter(length(col("w")) >= col("L"))
      .select(col("freq"), col("L"), col("w"),
        explode(expr(s"sequence(1, length(w) - L + 1)")).as("st"))
      .select(expr("substr(w, st, L)").as("tok"), col("freq"))
      .groupBy(col("tok")).agg(sum(col("freq")).cast("long").as("cnt"))
    val chars = wf
      .select(col("w"), explode(expr("sequence(1, length(w))")).as("st"))
      .select(expr("substr(w, st, 1)").as("tok")).distinct()
      .localCheckpoint(true)

    var weights = cand0.localCheckpoint(true)
    for (_ <- 1 to UNI_K) {
      // NOTE the explode is INLINE over the p_k columns (no
      // intermediate `pieces` alias): aliasing the array first and
      // exploding the alias puts one more Project between the
      // `length(tok) >= 2` filter below and the ~200-column DP chain,
      // and PushPredicateThroughNonJoin's alias substitution then
      // expands the pushed predicate doubly-exponentially — the
      // SAME combinatorial trap as DuckDB's lateral-alias binder,
      // observed as an optimizer hang (>3.5 min, jstack pinned in
      // AliasHelper.trimAliases) when this was refactored naively.
      val counts = viterbiDp(wf, uniScored(weights))
        .select(col("freq"),
          explode(filter(array((1 to UNI_W).map(k => col(s"p_$k")): _*),
            p => p.isNotNull)).as("tok"))
        .groupBy(col("tok")).agg(sum(col("freq")).cast("long").as("cnt"))
      // prune zero-count multi-char pieces; add-one floor on chars
      weights = counts.filter(length(col("tok")) >= 2)
        .unionByName(chars.join(counts, Seq("tok"), "left")
          .select(col("tok"),
            (coalesce(col("cnt"), lit(0L)) + 1).cast("long").as("cnt")))
        .localCheckpoint(true)
    }
    (wf, weights)
  }

  /** Unigram-LM tokenizer ENCODE — the consumer face of
    * [[unigramTrain]], completing the family symmetry ([[bpeTokens]] /
    * [[bpeTrain]] are the merge-based pair): train the vocabulary,
    * then Viterbi-segment the WHOLE corpus under the final trained
    * scores and report per-document segmentation evidence — word /
    * piece / OOV counts plus an md5 fingerprint of the full piece
    * stream in word order, so the oracle must reproduce every piece
    * of every word to hash-match.
    *
    * Scale shape: each DISTINCT word is segmented once (the trainer's
    * E-step machinery, distinct-word-sized) and the result is joined
    * back to the corpus word stream by a word-keyed equi-join — the
    * same factor-out-the-distinct-words discipline the trainer uses,
    * so the corpus-sized work is one posexplode + one shuffle join +
    * one per-doc aggregate. Words longer than [[UNI_W]] ride through
    * as single OOV pieces (the UNK convention — a bounded-unroll DP
    * needs a length cap; real tokenizers cap sentence length the same
    * way), counted in `n_oov` so the coverage loss is visible.
    * Verify-gated, not headlined: the training prefix IS
    * `text_unigram_train`'s benched shape and the encode suffix
    * (explode + equi-join + agg) is subsumed by the benched
    * text-family scans.
    */
  def unigramTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val (wf, weights) = uniTrained(spark, sfDir)
    // checkpoint the distinct-word segmentation BEFORE the corpus
    // join: it is Heaps'-bounded (the design reason segmentation
    // happens per distinct word at all), and the cut keeps the DP's
    // ~200-column alias chain out of the join's optimizer pass —
    // Catalyst constraint propagation over that chain is the same
    // combinatorial trap DuckDB's lateral-alias binder was (the
    // un-checkpointed form sat >5 min in optimization at sf0.001;
    // the trainer never sees this because its DP ends in an
    // aggregate, not a join)
    val segs = viterbiDp(wf, uniScored(weights))
      .select(col("w"),
        reverse(filter(array((1 to UNI_W).map(k => col(s"p_$k")): _*),
          p => p.isNotNull)).as("pieces"))
      .select(col("w"), array_join(col("pieces"), ",").as("piece_str"),
        size(col("pieces")).as("n_pieces"))
      .localCheckpoint(true)
    val dwp = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(TextOps.words(col("text"))).as(Seq("pos0", "w")))
      .filter(length(col("w")) >= 1)
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("w"))
    dwp.join(segs, Seq("w"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("piece_str"), col("w")).as("piece_str"),
        coalesce(col("n_pieces"), lit(1)).as("np"),
        (length(col("w")) > UNI_W).cast("int").as("oov"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("oov")).cast("bigint").as("n_oov"),
        sum(col("np")).cast("bigint").as("n_pieces"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("piece_str")))),
            x => x.getField("piece_str")),
          "|")).as("seg_fp"))
      .orderBy(col("doc_id"))
  }

  /** Viterbi-segment every distinct word under `vocab(tok, s)`:
    * returns the raw DP frame — (w, freq) plus the backtraced piece
    * columns `p_1..p_W` (last piece first; callers filter nulls and
    * reverse for word order). The E-step counts explode them; the
    * encode face assembles and fingerprints them. Callers MUST
    * project the p_k columns directly — see the E-step note on the
    * alias-substitution trap. The DP is unrolled over word positions
    * 1..[[UNI_W]]: pivot each word's in-vocab piece scores to
    * `s_<j>_<i>` columns, compute `dp_i = max_j (dp_j + s_j_i)` with
    * backpointers, then walk the backpointers [[UNI_W]] steps to emit
    * the winning segmentation.
    */
  private def viterbiDp(wf: DataFrame, vocab: DataFrame): DataFrame = {
    val NEG = lit(BigDecimal("-999999")).cast("decimal(20,12)")
    val ps = wf
      .select(col("w"), col("freq"),
        explode(expr(s"sequence(1, $UNI_P)")).as("L"))
      .filter(length(col("w")) >= col("L"))
      .select(col("w"), col("freq"), col("L"),
        explode(expr(s"sequence(1, length(w) - L + 1)")).as("st"))
      .select(col("w"), col("freq"), (col("st") - 1).as("j"),
        (col("st") - 1 + col("L")).as("i"),
        expr("substr(w, st, L)").as("tok"))
      .join(broadcast(vocab), Seq("tok"))
    val spanCols = uniSpans.map { case (j, i) =>
      max(when(col("j") === j && col("i") === i, col("s")))
        .as(s"s_${j}_$i")
    }
    val piv = ps.groupBy(col("w"), col("freq"))
      .agg(spanCols.head, spanCols.tail: _*)

    // dp/backpointers, positions 1..W; dp(0) = 0. Ties prefer the
    // LARGER j (= shorter final piece): the bp CASE checks j = i-1
    // first. Spans beyond len(w) compute garbage that the backtrace
    // never reads (it starts at len(w)).
    def sCol(j: Int, i: Int) = coalesce(col(s"s_${j}_$i"), NEG)
    var df = piv.withColumn("dp_0", lit(BigDecimal(0)).cast("decimal(20,12)"))
    for (i <- 1 to UNI_W) {
      val js = (math.max(0, i - UNI_P) until i).reverse // larger j first
      val cands = js.map(j => (j, col(s"dp_$j") + sCol(j, i)))
      df = cands.foldLeft(df) { case (d, (j, c)) =>
        d.withColumn(s"c_${j}_$i", c)
      }
      df = df.withColumn(s"dp_$i",
        if (cands.size == 1) col(s"c_${cands.head._1}_$i")
        else greatest(cands.map { case (j, _) => col(s"c_${j}_$i") }: _*))
      df = df.withColumn(s"bp_$i",
        cands.tail.foldLeft(
            when(col(s"dp_$i") === col(s"c_${js.head}_$i"), lit(js.head))) {
          case (acc, (j, _)) =>
            acc.when(col(s"dp_$i") === col(s"c_${j}_$i"), lit(j))
        })
    }
    // backtrace: e1 = len(w); st_k = bp(e_k); piece_k = w[st_k, e_k)
    def bpAt(e: Column): Column =
      (1 to UNI_W).tail.foldLeft(when(e === 1, col("bp_1"))) {
        case (acc, i) => acc.when(e === i, col(s"bp_$i"))
      }
    df = df.withColumn("e_1", length(col("w")))
    for (k <- 1 to UNI_W) {
      df = df.withColumn(s"st_$k",
          when(col(s"e_$k") > 0, bpAt(col(s"e_$k"))))
        .withColumn(s"p_$k",
          when(col(s"e_$k") > 0,
            expr(s"substr(w, st_$k + 1, e_$k - st_$k)")))
      if (k < UNI_W) df = df.withColumn(s"e_${k + 1}", col(s"st_$k"))
    }
    df
  }

  /** The oracle replays the SAME unrolled DP — generated
    * programmatically from the same span list so both engines encode
    * one algorithm. All per-round vocabularies MATERIALIZED.
    *
    * Each DP position and each backtrace step gets its OWN chained
    * CTE rather than a lateral column alias in one SELECT: DuckDB's
    * binder expands lateral alias references textually, so a chained
    * DP (`dp_i` over `dp_{i-1..i-3}`, then `e_{k+1} = st_k` over an
    * 8-way CASE of backpointers) grows doubly-exponentially — EXPLAIN
    * alone ran >5 min at sf0.001. With one CTE per step every
    * cross-step reference binds to a real column and the plan is
    * linear in [[UNI_W]] (0.2 s at sf0.001). Spark never hits this
    * because `CollapseProject` refuses to merge projections that
    * would duplicate non-trivial expressions.
    */
  private val uniPieceCols = (1 to UNI_W).map(k => s"p_$k").mkString(", ")

  /** The CTE chain that Viterbi-segments `wf` under vocabulary CTE
    * `vocab`, terminating in `bt$tag(w, freq, p_1..p_W)`. Shared by
    * every training round (tag = round number, vocab = previous
    * round's scores) and by the encode pass (tag = "e", vocab = the
    * final trained scores) — one generator, one algorithm.
    */
  private def uniSegCtes(tag: String, vocab: String): String = {
    val spanCols = uniSpans.map { case (j, i) =>
      s"max(CASE WHEN j = $j AND i = $i THEN s END) AS s_${j}_$i"
    }.mkString(",\n      ")
    val dpCtes = {
      val base =
        s"d${tag}_0 AS (\n  SELECT *, CAST(0 AS DECIMAL(20,12)) AS dp_0 FROM piv$tag)"
      val steps = (1 to UNI_W).map { i =>
        val js = (math.max(0, i - UNI_P) until i).reverse
        val cands = js.map(j =>
          s"dp_$j + COALESCE(s_${j}_$i, CAST(-999999 AS DECIMAL(20,12))) AS c_${j}_$i")
        val dp =
          if (js.size == 1) s"c_${js.head}_$i AS dp_$i"
          else s"greatest(${js.map(j => s"c_${j}_$i").mkString(", ")}) AS dp_$i"
        val bp = "CASE " + js.map(j =>
          s"WHEN dp_$i = c_${j}_$i THEN $j").mkString(" ") + s" END AS bp_$i"
        s"""d${tag}_$i AS (
           |  SELECT *,
           |      ${cands.mkString(",\n      ")},
           |      $dp,
           |      $bp
           |  FROM d${tag}_${i - 1})""".stripMargin
      }
      (base +: steps).mkString(",\n")
    }
    val btCtes = {
      val base =
        s"bt${tag}_0 AS (\n  SELECT *, len(w) AS e_1 FROM d${tag}_$UNI_W)"
      val steps = (1 to UNI_W).map { k =>
        val bpAt = "CASE " + (1 to UNI_W).map(i =>
          s"WHEN e_$k = $i THEN bp_$i").mkString(" ") + " END"
        val st = s"CASE WHEN e_$k > 0 THEN $bpAt END AS st_$k"
        val p =
          s"CASE WHEN e_$k > 0 THEN substr(w, st_$k + 1, e_$k - st_$k) END AS p_$k"
        val next = if (k < UNI_W) s",\n      st_$k AS e_${k + 1}" else ""
        s"""bt${tag}_$k AS (
           |  SELECT *,
           |      $st,
           |      $p$next
           |  FROM bt${tag}_${k - 1})""".stripMargin
      }
      (base +: steps).mkString(",\n")
    }
    s"""ps$tag AS (
       |  -- explicit JOIN … USING so the engine hash-joins the span
       |  -- table to the vocabulary; a comma-join with the equality
       |  -- in WHERE nested-loops |words|·spans·|vocab| string
       |  -- compares (measured: minutes at sf0.001)
       |  SELECT q.w, q.freq, q.j, q.i, v.s
       |  FROM (SELECT wf.w, wf.freq, t.st - 1 AS j,
       |          t.st - 1 + l.L AS i, substr(wf.w, t.st, l.L) AS tok
       |        FROM wf,
       |             generate_series(1, $UNI_P) AS l(L),
       |             unnest(generate_series(1, len(w) - l.L + 1)) AS t(st)
       |        WHERE len(wf.w) >= l.L) q
       |  JOIN $vocab v USING (tok)),
       |piv$tag AS (
       |  SELECT w, freq,
       |      $spanCols
       |  FROM ps$tag GROUP BY w, freq),
       |$dpCtes,
       |$btCtes,
       |bt$tag AS (
       |  SELECT w, freq, $uniPieceCols FROM bt${tag}_$UNI_W)""".stripMargin
  }

  /** Shared oracle prefix: word frequencies, seed vocabulary, and the
    * [[UNI_K]] training rounds, ending at the final scored vocabulary
    * `v$UNI_K`. All per-round vocabularies MATERIALIZED.
    */
  private def uniOracleBase: String = {
    def round(r: Int): String =
      s"""${uniSegCtes(r.toString, s"v${r - 1}")},
         |cnts$r AS (
         |  SELECT u.piece AS tok, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM bt$r,
         |       unnest(list_filter([$uniPieceCols], x -> x IS NOT NULL)) AS u(piece)
         |  GROUP BY u.piece),
         |w$r AS MATERIALIZED (
         |  SELECT tok, cnt FROM cnts$r WHERE len(tok) >= 2 AND cnt > 0
         |  UNION ALL
         |  SELECT c.tok, CAST(COALESCE(n.cnt, 0) + 1 AS BIGINT) AS cnt
         |  FROM chars c LEFT JOIN cnts$r n USING (tok)),
         |v$r AS MATERIALIZED (
         |  SELECT tok,
         |    CAST(ln(CAST(cnt AS DOUBLE) / t.tot) AS DECIMAL(20,12)) AS s
         |  FROM w$r, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM w$r) t)"""
        .stripMargin
    val rounds = (1 to UNI_K).map(round).mkString(",\n")
    s"""WITH dw AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wf AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM dw
       |  WHERE len(w) BETWEEN 1 AND $UNI_W GROUP BY w),
       |cand0 AS (
       |  SELECT substr(w, t.st, l.L) AS tok, freq
       |  FROM wf,
       |       generate_series(1, $UNI_P) AS l(L),
       |       unnest(generate_series(1, len(w) - l.L + 1)) AS t(st)
       |  WHERE len(w) >= l.L),
       |w0 AS (SELECT tok, CAST(sum(freq) AS BIGINT) AS cnt
       |       FROM cand0 GROUP BY tok),
       |chars AS MATERIALIZED (
       |  SELECT DISTINCT substr(w, t.st, 1) AS tok
       |  FROM wf, unnest(generate_series(1, len(w))) AS t(st)),
       |v0 AS MATERIALIZED (
       |  SELECT tok,
       |    CAST(ln(CAST(cnt AS DOUBLE) / t.tot) AS DECIMAL(20,12)) AS s
       |  FROM w0, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM w0) t),
       |$rounds""".stripMargin
  }

  private val unigramTrainOracle: String =
    s"""$uniOracleBase
       |SELECT rank, tok, tok_len, cnt FROM (
       |  SELECT row_number() OVER
       |      (ORDER BY cnt DESC, len(tok) DESC, tok) AS rank,
       |    tok, CAST(len(tok) AS INT) AS tok_len, cnt
       |  FROM w$UNI_K)
       |WHERE rank <= $UNI_OUT
       |ORDER BY rank""".stripMargin

  /** Encode oracle: one more segmentation pass under the FINAL scores,
    * then a positional re-join to the corpus word stream and the
    * per-document fingerprint aggregate — `string_agg(..., ORDER BY
    * pos)` is DuckDB's ordered-aggregate twin of the Spark side's
    * sort_array(collect_list(struct(pos, ...))).
    */
  private val unigramTokensOracle: String =
    s"""$uniOracleBase,
       |${uniSegCtes("e", s"v$UNI_K")},
       |seg AS MATERIALIZED (
       |  SELECT w,
       |    array_to_string(
       |      list_reverse(list_filter([$uniPieceCols], x -> x IS NOT NULL)),
       |      ',') AS piece_str,
       |    len(list_filter([$uniPieceCols], x -> x IS NOT NULL)) AS n_pieces
       |  FROM bte),
       |dwp AS (
       |  SELECT doc_id, g.i AS pos, parts[g.i] AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |        FROM documents),
       |       unnest(generate_series(1, len(parts))) AS g(i)
       |  WHERE len(parts[g.i]) >= 1)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(CASE WHEN len(w) > $UNI_W THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_oov,
       |  CAST(sum(COALESCE(s.n_pieces, 1)) AS BIGINT) AS n_pieces,
       |  md5(string_agg(COALESCE(s.piece_str, w), '|' ORDER BY pos))
       |    AS seg_fp
       |FROM dwp LEFT JOIN seg s USING (w)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Quality scoring: length, stopword ratio, average word length,
    * non-alphanumeric ratio, and a composite score. Ratios are
    * int/int double divisions — deterministic across engines without
    * rounding tricks.
    */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val nWords = size(ws)
    val nStop = size(filter(ws, w => w.isInCollection(stopwords)))
    val alnum = length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))
    val noSpace = length(regexp_replace(col("text"), " ", ""))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        nWords.as("n_words"),
        nStop.as("n_stopwords"),
        (nStop.cast("double") / nWords).as("stop_ratio"),
        (noSpace.cast("double") / nWords).as("avg_word_len"),
        ((length(col("text")) - alnum).cast("double") / length(col("text")))
          .as("nonalnum_ratio"),
        ((lit(1.0) - nStop.cast("double") / nWords) *
          least(lit(1.0), nWords.cast("double") / 100.0)).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  private val qualityOracle = {
    val stop = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(ws) AS INT) AS n_words,
       |    CAST(len(list_filter(ws, w -> w IN ($stop))) AS INT) AS n_stopwords,
       |    length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS alnum,
       |    length(regexp_replace(text, ' ', '', 'g')) AS no_space,
       |    length(text) AS n_chars
       |  FROM d)
       |SELECT doc_id, n_words, n_stopwords,
       |  CAST(n_stopwords AS DOUBLE)/n_words AS stop_ratio,
       |  CAST(no_space AS DOUBLE)/n_words AS avg_word_len,
       |  CAST(n_chars - alnum AS DOUBLE)/n_chars AS nonalnum_ratio,
       |  (1.0 - CAST(n_stopwords AS DOUBLE)/n_words)
       |    * least(1.0, CAST(n_words AS DOUBLE)/100.0) AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "los", "que", "es"),
    "fr" -> Seq("le", "la", "et", "est"))

  /** Language ID by marker-word counts (n-gram/stopword heuristic) —
    * argmax with a fixed priority order for ties, 'unknown' when no
    * marker hits. Rolled up as a (label, prediction) confusion table.
    * (The synthetic corpus is English word-soup under every `lang`
    * label, so the heuristic's mechanics — not corpus realism — are
    * what the oracle checks.)
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val scores = markers.map { case (l, ms) =>
      l -> size(filter(ws, w => w.isInCollection(ms)))
    }
    val Seq(en, de, es, fr) = scores.map(_._2)
    val pred = when(en > 0 && en >= greatest(de, es, fr), "en")
      .when(de > 0 && de >= greatest(es, fr), "de")
      .when(es > 0 && es >= fr, "es")
      .when(fr > 0, "fr")
      .otherwise("unknown")
    Tables.documents(spark, sfDir)
      .select(col("lang"), pred.as("predicted_lang"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted_lang"))
  }

  private val langIdOracle = {
    def cnt(ms: Seq[String]) =
      s"len(list_filter(ws, w -> w IN (${ms.map(s => s"'$s'").mkString(", ")})))"
    val Seq(en, de, es, fr) = markers.map(m => cnt(m._2))
    s"""WITH d AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
       |p AS (SELECT lang,
       |  CASE WHEN $en > 0 AND $en >= greatest($de, $es, $fr) THEN 'en'
       |       WHEN $de > 0 AND $de >= greatest($es, $fr) THEN 'de'
       |       WHEN $es > 0 AND $es >= $fr THEN 'es'
       |       WHEN $fr > 0 THEN 'fr'
       |       ELSE 'unknown' END AS predicted_lang
       |  FROM d)
       |SELECT lang, predicted_lang, count(*) AS n_docs
       |FROM p GROUP BY lang, predicted_lang
       |ORDER BY lang, predicted_lang""".stripMargin
  }

  /** Document fingerprinting: content-defined md5 fingerprint over the
    * sorted distinct-word set (word-order-insensitive) + the minimum
    * word hash (1-of-k winnowing sample).
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val dws = array_sort(array_distinct(TextOps.words(col("text"))))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(concat_ws(" ", dws)).as("fingerprint"),
        array_min(transform(dws, w => TextOps.h60(w))).as("min_word_hash"))
      .orderBy(col("doc_id"))
  }

  private val fingerprintOracle =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(${TextOps.wordsSql})) AS dws
       |  FROM documents)
       |SELECT doc_id,
       |  md5(array_to_string(dws, ' ')) AS fingerprint,
       |  list_min(list_transform(dws, w -> ${TextOps.h60Sql("w")})) AS min_word_hash
       |FROM d ORDER BY doc_id""".stripMargin

  private val phoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val idRe = "[0-9]{9}[0-9]*"

  /** PII redaction — the scrub pass a training corpus runs before
    * anything else sees the text. The contact line is SYNTHESIZED
    * deterministically from customer keys (the testdata has no real
    * phone column; the redaction MECHANICS are what the oracle
    * checks): phone-shaped tokens and long digit runs (the 9-digit
    * customer ids inside `c_name`) are replaced with typed
    * placeholders, match counts kept as audit columns. Pure narrow
    * codegen'd regex ops — zero shuffles at any scale.
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val k = col("c_custkey")
    val phone = concat(
      (lit(10) + k % 90).cast("string"), lit("-"),
      (lit(100) + (k * 7) % 900).cast("string"), lit("-"),
      (lit(100) + (k * 13) % 900).cast("string"), lit("-"),
      (lit(1000) + (k * 31) % 9000).cast("string"))
    val raw = concat_ws(" ", col("c_name"), lit("call me at"), phone,
      lit("segment"), col("c_mktsegment"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), raw.as("raw"))
      .select(col("c_custkey"),
        regexp_replace(regexp_replace(col("raw"), phoneRe, "[PHONE]"),
          idRe, "[ID]").as("redacted"),
        size(expr(s"regexp_extract_all(raw, '$phoneRe', 0)")).as("n_phones"),
        size(expr(s"regexp_extract_all(raw, '$idRe', 0)")).as("n_ids"))
      .orderBy(col("c_custkey"))
  }

  private val piiOracle =
    s"""WITH r AS (
       |  SELECT c_custkey,
       |    c_name || ' call me at ' ||
       |    CAST(10 + c_custkey % 90 AS VARCHAR) || '-' ||
       |    CAST(100 + (c_custkey * 7) % 900 AS VARCHAR) || '-' ||
       |    CAST(100 + (c_custkey * 13) % 900 AS VARCHAR) || '-' ||
       |    CAST(1000 + (c_custkey * 31) % 9000 AS VARCHAR) ||
       |    ' segment ' || c_mktsegment AS raw
       |  FROM customer)
       |SELECT c_custkey,
       |  regexp_replace(regexp_replace(raw, '$phoneRe', '[PHONE]', 'g'),
       |    '$idRe', '[ID]', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(raw, '$phoneRe')) AS INT) AS n_phones,
       |  CAST(len(regexp_extract_all(raw, '$idRe')) AS INT) AS n_ids
       |FROM r ORDER BY c_custkey""".stripMargin

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace — the canonical-form pass that feeds dedup (exact
    * dedup on normalized text catches case/punctuation variants).
    * Runs over the part catalog strings (mixed case + '#').
    */
  def normalize(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = concat_ws(" ", col("p_name"), col("p_brand"), col("p_type"))
    val norm = trim(regexp_replace(
      regexp_replace(lower(raw), "[^a-z0-9 ]", " "), " +", " "))
    Tables.part(spark, sfDir)
      .select(col("p_partkey"), norm.as("normalized"))
      .withColumn("n_tokens", size(split(col("normalized"), " ")))
      .orderBy(col("p_partkey"))
  }

  private val normalizeOracle =
    """WITH n AS (
      |  SELECT p_partkey,
      |    trim(regexp_replace(regexp_replace(
      |      lower(p_name || ' ' || p_brand || ' ' || p_type),
      |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS normalized
      |  FROM part)
      |SELECT p_partkey, normalized,
      |  CAST(len(string_split(normalized, ' ')) AS INT) AS n_tokens
      |FROM n ORDER BY p_partkey""".stripMargin

  /** N-gram statistics: top-5 bigrams per language by frequency
    * (deterministic tie-break on the bigram itself) — the vocabulary /
    * language-model-stats pass of a corpus pipeline. Bigrams are
    * built positionally with the native codegen'd
    * [[graft.functions.WordNGrams]] kernel (one pass, no shuffle),
    * then one count aggregation + one per-language window top-k; at
    * 100 TB the count is partial-aggregated map-side and the top-k is
    * WindowGroupLimit-pushed.
    */
  def ngramVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    // native codegen'd n-gram kernel — the interpreted HOF spelling made
    // the COLD run ~92 s at sf0.1 (6.5 s after JIT warmed the interpreter)
    val bigrams = graft.functions.GraftFunctions.wordNGrams(spark, ws, 2)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("bigram"))
    Tables.documents(spark, sfDir)
      .select(col("lang"), explode(bigrams).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rk"))
  }

  private val ngramOracle =
    """WITH b AS (
      |  SELECT lang, unnest(list_transform(
      |    generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
      |  FROM documents),
      |c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY lang, bigram),
      |r AS (
      |  SELECT lang, bigram, n,
      |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
      |  FROM c)
      |SELECT lang, CAST(rk AS INT) AS rk, bigram, n
      |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin

  /** Repetition signals (the Gopher-style near-gibberish detectors):
    * type-token ratio, top-word share, duplicate-bigram ratio. The
    * per-word counts are an explode + two-level aggregation — at
    * 100 TB one shuffle on (doc, word), partial-aggregated map-side;
    * the bigram stats never leave the row (array expressions).
    *
    * The bigram stats are a SEPARATE per-doc branch joined back on
    * doc_id: putting `size(bi)` in the same select as `explode(ws)`
    * plans the Project ABOVE the Generate, re-evaluating the
    * interpreted bigram lambdas once per exploded word row — O(W²)
    * per doc (measured 28 s for 500 docs at sf0.01; this shape is
    * 0.5 s). The join is per-doc-keyed and broadcast-size relative
    * to the exploded word table at any scale.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val bi = graft.functions.GraftFunctions.wordNGrams(spark, ws, 2)
    val biStats = Tables.documents(spark, sfDir)
      .select(col("doc_id"), bi.as("bi"))
      .select(col("doc_id"), size(col("bi")).as("n_bi"),
        size(array_distinct(col("bi"))).as("n_bi_d"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(ws).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("max_c"))
      .join(biStats, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        (col("max_c").cast("double") / col("n_words")).as("top_word_share"),
        (col("n_distinct_words").cast("double") / col("n_words"))
          .as("type_token_ratio"),
        when(col("n_bi") > 0,
          lit(1.0) - col("n_bi_d").cast("double") / col("n_bi"))
          .otherwise(lit(0.0)).as("dup_bigram_ratio"))
      .orderBy(col("doc_id"))
  }

  private val repetitionOracle =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, ws,
      |  list_transform(generate_series(1, greatest(len(ws)-1, 0)),
      |    i -> ws[i]||' '||ws[i+1]) AS bi FROM d),
      |w AS (SELECT doc_id, unnest(ws) AS w FROM g),
      |c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
      |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
      |  count(*) AS n_distinct_words, max(c) AS max_c FROM c GROUP BY doc_id),
      |b AS (SELECT doc_id, CAST(len(bi) AS INT) AS n_bi,
      |  CAST(len(list_distinct(bi)) AS INT) AS n_bi_d FROM g)
      |SELECT a.doc_id, n_words, n_distinct_words,
      |  CAST(max_c AS DOUBLE)/n_words AS top_word_share,
      |  CAST(n_distinct_words AS DOUBLE)/n_words AS type_token_ratio,
      |  CASE WHEN n_bi > 0 THEN 1.0 - CAST(n_bi_d AS DOUBLE)/n_bi
      |       ELSE 0.0 END AS dup_bigram_ratio
      |FROM a JOIN b ON a.doc_id = b.doc_id ORDER BY a.doc_id""".stripMargin

  /** Quality-filter funnel (the C4/Gopher-style keep/drop decision):
    * each document gets the FIRST failing rule as its rejection
    * reason; the rollup reports the funnel. One narrow scan + one
    * tiny aggregation — the decision column itself is what a real
    * pipeline writes back to the corpus.
    */
  def filterFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(TextOps.qualityReason(col("text")).as("reason"), col("n_chars"))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_total"))
      .orderBy(col("reason"))
  }

  private val funnelOracle =
    s"""WITH r AS (
       |  SELECT n_chars, ${TextOps.qualityReasonSql("text")} AS reason
       |  FROM documents)
       |SELECT reason, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_total
       |FROM r GROUP BY reason ORDER BY reason""".stripMargin

  /** Sliding-window document chunking: fixed word-budget chunks
    * (W=40) with stride S=30 (10-word overlap) — the preprocessing
    * step that turns documents into training sequences with context
    * carry-over. Pure narrow plan: one generator fan-out per doc, no
    * shuffle until the final presentation sort; at 100 TB chunking is
    * scan-bound and embarrassingly parallel.
    */
  def docChunking(spark: SparkSession, sfDir: String): DataFrame = {
    val W = 40
    val S = 30
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .withColumn("n", size(col("ws")))
    d.select(col("doc_id"), col("ws"),
        explode(expr(s"sequence(0, n - 1, $S)")).as("st"))
      .withColumn("chunk", slice(col("ws"), col("st") + lit(1), lit(W)))
      .select(col("doc_id"), (col("st") / S).cast("int").as("chunk_id"),
        size(col("chunk")).as("n_chunk_words"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val chunkingOracle =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, CAST(st/30 AS INT) AS chunk_id,
      |    list_slice(ws, st + 1, least(st + 40, n)) AS chunk
      |  FROM d, unnest(generate_series(0, n - 1, 30)) AS t(st))
      |SELECT doc_id, chunk_id, CAST(len(chunk) AS INT) AS n_chunk_words,
      |  array_to_string(chunk, ' ') AS chunk_text
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** BM25 relevance scoring (Robertson/Spärck Jones; the "+1" robust
    * idf variant Lucene uses) of every document against a fixed
    * 3-term query — the retrieval primitive a training-data pipeline
    * uses for quality-weighted sampling and benchmark-decontamination
    * triage. Shape: one narrow codegen'd pass computes per-doc term
    * frequencies + doc length (no explode — `filter()` over the
    * token array keeps tf per-row); a 1-row global aggregate (N,
    * avgdl, per-term df) broadcasts back via cross join; the score is
    * a fixed-order closed-form sum, so no float nondeterminism. At
    * 100 TB: corpus-scan-bound, zero shuffle except the final
    * TakeOrderedAndProject top-k.
    */
  def bm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25Scored(spark, sfDir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  /** The BM25-scored corpus (doc_id, bm25 > 0, rounded 4dp), unranked —
    * shared by `text_bm25` (top-20) and the hybrid-retrieval lexical
    * leg ([[RetrievalQueries]]), so both gates exercise ONE scoring
    * implementation.
    */
  private[queries] def bm25Scored(spark: SparkSession, sfDir: String): DataFrame = {
    val terms = Seq("vector", "spark", "key")
    val k1 = 1.2
    val b = 0.75
    val ws = TextOps.words(col("text"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(ws, w => w === lit(t))).as(s"tf$i")
    }
    // perDoc feeds both the stats aggregate and the scoring join; it's
    // 5 ints per doc, so caching it beats re-tokenizing the corpus
    // (Verify/Bench clearCache() between queries)
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("doc_id") +: size(ws).as("dl") +: tfCols: _*)
      .persist()
    val statAggs = count(lit(1)).cast("double").as("n") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    // fixed-order sum of per-term contributions — identical expression
    // tree in the oracle, so doubles agree bit-for-bit pre-rounding
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val norm = tf * (k1 + 1) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
      when(tf > 0, idf * norm).otherwise(lit(0.0))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 4).as("bm25"))
      .filter(col("bm25") > 0)
  }

  /** DuckDB twin of [[bm25Scored]] as a CTE chain ending in
    * `scored(doc_id, bm25)` — composed by both the `text_bm25` oracle
    * and the hybrid-retrieval oracle.
    */
  private[queries] val bm25ScoredSql =
    """t AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS dl,
      |    len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS tf0,
      |    len(list_filter(string_split(text, ' '), x -> x = 'spark'))  AS tf1,
      |    len(list_filter(string_split(text, ' '), x -> x = 'key'))    AS tf2
      |  FROM documents),
      |s AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
      |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
      |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
      |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      |  FROM t),
      |scored AS (
      |  SELECT doc_id, round(
      |      (CASE WHEN tf0 > 0 THEN ln(1.0 + (n - df0 + 0.5)/(df0 + 0.5))
      |        * (CAST(tf0 AS DOUBLE) * 2.2)/(CAST(tf0 AS DOUBLE) + 1.2*(0.25 + 0.75*dl/avgdl)) ELSE 0.0 END)
      |    + (CASE WHEN tf1 > 0 THEN ln(1.0 + (n - df1 + 0.5)/(df1 + 0.5))
      |        * (CAST(tf1 AS DOUBLE) * 2.2)/(CAST(tf1 AS DOUBLE) + 1.2*(0.25 + 0.75*dl/avgdl)) ELSE 0.0 END)
      |    + (CASE WHEN tf2 > 0 THEN ln(1.0 + (n - df2 + 0.5)/(df2 + 0.5))
      |        * (CAST(tf2 AS DOUBLE) * 2.2)/(CAST(tf2 AS DOUBLE) + 1.2*(0.25 + 0.75*dl/avgdl)) ELSE 0.0 END)
      |    , 4) AS bm25
      |  FROM t, s)""".stripMargin

  private val bm25Oracle =
    s"""WITH $bm25ScoredSql
       |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** Unigram language-model quality score (the CCNet/perplexity-filter
    * shape): each document scored by its mean token log-probability
    * under the corpus's own unigram distribution — low scores flag
    * surprising/garbage text for filtering or re-weighting.
    *
    * Float determinism: a per-doc sum of doubles would depend on
    * aggregation order, so each word's ln p(w) is quantized once to
    * DECIMAL(20,12) (well above double ulp noise, far below any
    * rounding midpoint), multiplied by the exact integer count, and
    * summed as decimals — order-free. Shape at 100 TB: one (doc,word)
    * count shuffle, a tiny vocab aggregate broadcast back, one per-doc
    * aggregate; the vocabulary is MBs when the corpus is TBs.
    */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame =
    lmPerDoc(spark, sfDir).orderBy(col("doc_id"))

  /** Per-doc unigram-LM frame (doc_id, dl, avg_logprob) shared by
    * [[lmScore]] and [[ccnetBuckets]].
    */
  private def lmPerDoc(spark: SparkSession, sfDir: String): DataFrame = {
    // counts feeds the vocabulary aggregate AND the scoring join —
    // persist so the corpus is tokenized once, not twice
    val counts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).cast("decimal(8,0)").as("cnt"))
      .persist()
    val vocab = counts.groupBy(col("word"))
      .agg(sum(col("cnt")).cast("long").as("cw"))
    val tot = vocab.agg(sum(col("cw")).cast("double").as("tot"))
    val lnp = vocab.crossJoin(broadcast(tot))
      .select(col("word"),
        log(col("cw").cast("double") / col("tot")).cast("decimal(20,12)").as("lnp"))
    counts.join(broadcast(lnp), "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("dl"),
        sum(col("cnt") * col("lnp")).cast("double").as("s"))
      .select(col("doc_id"), col("dl"),
        round(col("s") / col("dl").cast("double"), 4).as("avg_logprob"))
  }

  private val lmScoreOracle =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |c AS (
      |  SELECT doc_id, word, CAST(count(*) AS DECIMAL(8,0)) AS cnt
      |  FROM w GROUP BY doc_id, word),
      |v AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS cw FROM c GROUP BY word),
      |t AS (SELECT CAST(sum(cw) AS DOUBLE) AS tot FROM v),
      |q AS (SELECT word, CAST(ln(CAST(cw AS DOUBLE)/tot) AS DECIMAL(20,12)) AS lnp
      |      FROM v, t)
      |SELECT c.doc_id, CAST(sum(c.cnt) AS BIGINT) AS dl,
      |  round(CAST(sum(c.cnt * q.lnp) AS DOUBLE) / CAST(sum(c.cnt) AS DOUBLE), 4)
      |    AS avg_logprob
      |FROM c JOIN q USING (word)
      |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting high quality monolingual datasets from web crawl
    * data"): score every document with the in-engine LM
    * ([[lmPerDoc]]), then split each LANGUAGE into equal head /
    * middle / tail terciles by score — CCNet's per-language
    * perplexity buckets, where "head" feeds training and "tail" is
    * dropped or down-weighted. Thresholds are per-language and
    * data-dependent (a percentile, not a constant), which is the
    * method's point: one absolute cutoff across languages would
    * gut low-resource ones.
    *
    * Determinism: bucketing orders by the ROUNDED (4 dp) score with
    * doc_id tie-break, so both engines rank an identical key;
    * per-bucket means are summed as exact decimals (order-free)
    * before the final round. Scale shape (100 TB): the LM pass is
    * [[lmScore]]'s (one (doc,word) shuffle + MB-scale broadcast
    * vocab); the tercile split is one ntile window partitioned by
    * language — the sort is per-language over (id, score) slim rows.
    * A skew-prone language (en) can salt-presort, but the window
    * carries 16-byte rows, not text.
    */
  def ccnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = lmPerDoc(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")),
        "doc_id")
    scored
      .withColumn("b", ntile(3).over(
        Window.partitionBy(col("lang"))
          .orderBy(col("avg_logprob").desc, col("doc_id"))))
      .withColumn("bucket",
        when(col("b") === 1, "head")
          .when(col("b") === 2, "middle").otherwise("tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("avg_logprob").cast("decimal(14,4)")).cast("double")
          / count(lit(1)), 4).as("mean_logprob"))
      .orderBy(col("lang"), col("bucket"))
  }

  private val ccnetOracle =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |c AS (
      |  SELECT doc_id, word, CAST(count(*) AS DECIMAL(8,0)) AS cnt
      |  FROM w GROUP BY doc_id, word),
      |v AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS cw FROM c GROUP BY word),
      |t AS (SELECT CAST(sum(cw) AS DOUBLE) AS tot FROM v),
      |q AS (SELECT word, CAST(ln(CAST(cw AS DOUBLE)/tot) AS DECIMAL(20,12)) AS lnp
      |      FROM v, t),
      |s AS (
      |  SELECT c.doc_id,
      |    round(CAST(sum(c.cnt * q.lnp) AS DOUBLE) / CAST(sum(c.cnt) AS DOUBLE), 4)
      |      AS avg_logprob
      |  FROM c JOIN q USING (word) GROUP BY c.doc_id),
      |l AS (
      |  SELECT s.doc_id, d.lang, s.avg_logprob
      |  FROM s JOIN documents d USING (doc_id)),
      |b AS (
      |  SELECT lang, avg_logprob,
      |    ntile(3) OVER (PARTITION BY lang
      |      ORDER BY avg_logprob DESC, doc_id) AS b
      |  FROM l)
      |SELECT lang,
      |  CASE WHEN b = 1 THEN 'head' WHEN b = 2 THEN 'middle'
      |       ELSE 'tail' END AS bucket,
      |  count(*) AS n_docs,
      |  round(CAST(sum(CAST(avg_logprob AS DECIMAL(14,4))) AS DOUBLE)
      |    / count(*), 4) AS mean_logprob
      |FROM b GROUP BY lang, b ORDER BY lang, bucket""".stripMargin

  /** Inverted-index build: word → document frequency, collection
    * frequency, and the sorted posting list — the index structure BM25
    * serving reads from. The groupBy(word) shuffle IS the index build;
    * at 100 TB each reducer writes one index segment, postings arrive
    * pre-groupable and get delta/varint-compressed downstream (here
    * they're emitted as a canonical comma-joined sorted string so both
    * engines hash identically). Doc-frequency skew (stopwords) is the
    * classic hot-key case — the salting pattern from
    * `join_skew_salted` applies to the tf pre-aggregation, which this
    * query does first so only (word, doc) pairs cross the wire, never
    * raw occurrences.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(explode(TextOps.words(col("text"))).as("word"), col("doc_id"))
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
      .orderBy(col("word"))
  }

  private val invertedIndexOracle =
    """WITH w AS (
      |  SELECT unnest(string_split(text, ' ')) AS word, doc_id FROM documents),
      |c AS (SELECT word, doc_id, count(*) AS tf FROM w GROUP BY word, doc_id)
      |SELECT word, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
      |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
      |FROM c GROUP BY word ORDER BY word""".stripMargin

  /** Per-document attribute table (the Dolma/RefinedWeb "attributes
    * file" pattern): every quality predicate evaluated INDEPENDENTLY
    * as its own boolean column — unlike [[TextOps.qualityReason]]'s
    * cascade, which reports only the FIRST failure — plus the failure
    * count, the keep decision, and the cascade reason for
    * cross-consistency (`first_reason = 'keep'` ⟺ `n_fail = 0`,
    * which the oracle hash implicitly pins on every row). Auditable
    * curation needs this shape: downstream consumers re-filter with
    * DIFFERENT thresholds without re-reading the corpus, and filter
    * regressions diff attribute-by-attribute instead of corpus-level
    * keep rates. One narrow scan, no shuffle until the presentation
    * sort; identical IEEE sub-expressions to the shared quality
    * filter, so the flags hash-match the SQL twins.
    */
  def docsAttributes(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    val ws = TextOps.words(t)
    val nWords = size(ws)
    val noSpace = length(regexp_replace(t, " ", ""))
    val alnum = length(regexp_replace(t, "[^a-z0-9 ]", ""))
    val avgWordLen = noSpace.cast("double") / nWords
    val nonalnum = (length(t) - alnum).cast("double") / length(t)
    val nStop = size(filter(ws, w => w.isInCollection(TextOps.stopwords)))
    val stopRatio = nStop.cast("double") / nWords
    val flags = Seq(
      (nWords < 20).as("too_short"),
      (nWords > 5000).as("too_long"),
      (avgWordLen < 3.0 || avgWordLen > 12.0).as("word_len"),
      (nonalnum > 0.3).as("symbols"),
      (stopRatio < 0.01).as("no_stopwords"))
    val nFail = flags.map(_.cast("int")).reduce(_ + _)
    Tables.documents(spark, sfDir)
      .select(col("doc_id") +: flags :+
        nFail.as("n_fail") :+
        (nFail === 0).as("keep") :+
        TextOps.qualityReason(t).as("first_reason"): _*)
      .orderBy(col("doc_id"))
  }

  private val attributesOracle = {
    val stop = TextOps.stopwords.map(s => s"'$s'").mkString(", ")
    val nw = "len(string_split(text, ' '))"
    val noSpace = "length(regexp_replace(text, ' ', '', 'g'))"
    val awl = s"CAST($noSpace AS DOUBLE)/$nw"
    val nonal = s"CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)/length(text)"
    val stopR = s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stop))) AS DOUBLE)/$nw"
    s"""WITH f AS (
       |  SELECT doc_id,
       |    $nw < 20 AS too_short,
       |    $nw > 5000 AS too_long,
       |    ($awl < 3.0 OR $awl > 12.0) AS word_len,
       |    $nonal > 0.3 AS symbols,
       |    $stopR < 0.01 AS no_stopwords,
       |    ${TextOps.qualityReasonSql()} AS first_reason
       |  FROM documents)
       |SELECT doc_id, too_short, too_long, word_len, symbols, no_stopwords,
       |  CAST(too_short AS INT) + CAST(too_long AS INT) + CAST(word_len AS INT)
       |    + CAST(symbols AS INT) + CAST(no_stopwords AS INT) AS n_fail,
       |  NOT (too_short OR too_long OR word_len OR symbols OR no_stopwords) AS keep,
       |  first_reason
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Corpus drift detection: per-source unigram-distribution
    * divergence from the whole corpus, KL(source ‖ corpus) in nats —
    * the monitoring primitive behind "did this crawl/source shift
    * under us between snapshots": a source whose word distribution
    * drifts from the mix gets flagged before it skews a training run.
    * KL here is well-defined without smoothing because every source
    * word IS in the corpus distribution (the corpus is the union), so
    * no zero-denominator terms exist.
    *
    * Float determinism (the [[lmScore]] rule): each word's
    * ln((cnt_sw·tot)/(tot_s·cw)) is quantized once to
    * DECIMAL(20,12), multiplied by the exact integer count and summed
    * as decimals — order-free across any partitioning — with ONE
    * IEEE division by tot_s at the end, then round(4).
    *
    * 100 TB shape: one (source, word) count shuffle (map-side
    * partials collapse repeats), the corpus vocabulary derived from
    * the same persisted counts (tokenize once), per-source totals are
    * |sources| rows and the corpus total is 1 row — both broadcast.
    * The join back to word-level counts is on the vocabulary, MBs
    * when the corpus is TBs.
    */
  def klDrift(spark: SparkSession, sfDir: String): DataFrame = {
    // counts feeds the vocab aggregate, the source totals AND the
    // scoring join — persist so the corpus is tokenized once; the
    // algebra lives in operators.Drift so the streaming monitor
    // applies the identical definition
    val counts = graft.operators.Drift
      .docCounts(Tables.documents(spark, sfDir)).persist()
    graft.operators.Drift.klFromCounts(counts)
  }

  private val klDriftOracle =
    """WITH w AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
      |c AS (
      |  SELECT source, word, CAST(count(*) AS DECIMAL(18,0)) AS cnt
      |  FROM w GROUP BY source, word),
      |v AS (SELECT word, CAST(sum(cnt) AS DOUBLE) AS cw FROM c GROUP BY word),
      |t AS (SELECT CAST(sum(cw) AS DOUBLE) AS tot FROM v),
      |s AS (SELECT source, CAST(sum(cnt) AS DOUBLE) AS tot_s,
      |        count(*) AS vocab_s
      |      FROM c GROUP BY source),
      |q AS (
      |  SELECT c.source, s.tot_s, s.vocab_s, c.cnt,
      |    CAST(ln((CAST(c.cnt AS DOUBLE) * t.tot) / (s.tot_s * v.cw))
      |      AS DECIMAL(20,12)) AS lnr
      |  FROM c JOIN s USING (source) JOIN v USING (word), t)
      |SELECT source, CAST(any_value(tot_s) AS BIGINT) AS n_tokens,
      |  any_value(vocab_s) AS n_vocab,
      |  round(CAST(sum(CAST(cnt AS DECIMAL(17,0)) * lnr) AS DOUBLE)
      |    / any_value(tot_s), 4) AS kl_nats
      |FROM q GROUP BY source ORDER BY source""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("text_tokens", Some(tokensOracle), tokens),
    Q("text_kl_drift", Some(klDriftOracle), klDrift),
    Q("text_bpe_tokens", Some(bpeOracle), bpeTokens),
    Q("text_bpe_train", Some(bpeTrainOracle), bpeTrain),
    Q("text_unigram_train", Some(unigramTrainOracle), unigramTrain),
    Q("text_unigram_tokens", Some(unigramTokensOracle), unigramTokens),
    Q("text_bm25", Some(bm25Oracle), bm25),
    Q("text_lm_score", Some(lmScoreOracle), lmScore),
    Q("text_ccnet_buckets", Some(ccnetOracle), ccnetBuckets),
    Q("text_inverted_index", Some(invertedIndexOracle), invertedIndex),
    Q("doc_chunking", Some(chunkingOracle), docChunking),
    Q("text_repetition", Some(repetitionOracle), repetition),
    Q("docs_filter_funnel", Some(funnelOracle), filterFunnel),
    Q("text_quality", Some(qualityOracle), quality),
    Q("docs_attributes", Some(attributesOracle), docsAttributes),
    Q("text_langid", Some(langIdOracle), langId),
    Q("text_fingerprint", Some(fingerprintOracle), fingerprint),
    Q("text_pii_redact", Some(piiOracle), piiRedact),
    Q("text_normalize", Some(normalizeOracle), normalize),
    Q("text_ngram_vocab", Some(ngramOracle), ngramVocab),
  )
}
