package graft

import graft.queries.{DedupQueries, GraphQueries, SimilarityQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-4 analytics operators —
  * properties the DuckDB oracle cannot vouch for (an identical bug in
  * both engines would still hash-match): PageRank remains a
  * probability distribution, funnels are monotone, transition rows
  * are distributions, retention starts at 1.
  */
class AnalyticsInvariantSpec extends SparkSpec {

  test("pagerank is a probability distribution after 5 iterations") {
    val ranks = GraphQueries.pagerank(spark, sf).collect()
    assert(ranks.nonEmpty)
    assert(ranks.forall(_.getDouble(1) > 0))
    val total = ranks.map(_.getDouble(1)).sum
    // damping mass conservation: sums to 1 up to quantization error
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass $total")
  }

  test("pagerankConverged early-exits on L1 delta and hits the fixed point") {
    import spark.implicits._
    // star graph a↔b, a↔c: outdeg a=2, b=c=1; the fixed point solves
    // r_a = .05 + .85(r_b + r_c), r_b = r_c = .05 + .85·r_a/2
    //   ⇒ r_a = 0.135/0.2775 ≈ 0.486486, r_b = r_c ≈ 0.256757
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"))
      .toDF("src", "dst")
    val (ranks, iters) = GraphQueries.pagerankConverged(edges, 1e-3, 50)
    assert(iters < 50, s"no early exit: ran $iters iterations")
    assert(iters > 3, s"converged suspiciously fast: $iters") // geometric at ~0.72/iter
    val m = ranks.collect()
      .map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(math.abs(m("a") - 0.135 / 0.2775) < 5e-3, s"a=${m("a")}")
    assert(math.abs(m("b") - m("c")) < 1e-9)
    assert(math.abs(m.values.sum - 1.0) < 1e-3)
  }

  test("funnel step counts are monotone non-increasing") {
    val steps = WindowQueries.eventsFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(steps("1_signup") >= steps("2_click_after"))
    assert(steps("2_click_after") >= steps("3_purchase_after"))
  }

  test("each transition-matrix row is a probability distribution") {
    val rows = WindowQueries.eventsTransitions(spark, sf)
      .groupBy(col("event_type")).agg(sum(col("p")).as("rowsum"))
      .collect()
    assert(rows.nonEmpty)
    // roundDiv4 quantizes each cell to 1e-4; 5 cells → ≤ 5e-4 drift
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 5e-4,
      s"${r.getString(0)} sums to ${r.getDouble(1)}"))
  }

  test("cohort retention at offset 0 is 1 for every cohort") {
    val r = WindowQueries.eventsRetention(spark, sf)
      .filter(col("week_offset") === 0).collect()
    assert(r.nonEmpty)
    // every user is by construction active in their first-seen week
    r.foreach(row => assert(row.getDouble(3) == 1.0))
  }

  test("sim_ann_pq: cosines never beat brute force, recall@10 >= 0.5") {
    val brute = SimilarityQueries.topkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val pq = SimilarityQueries.topkAnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(pq.nonEmpty)
    // rank-wise: an ANN's k-th best cosine is <= the exact k-th best
    pq.foreach { case (q, rank, _, cos) =>
      assert(cos <= brute((q, rank))._2 + 1e-9, s"q=$q rank=$rank ANN beat exact")
    }
    val bruteIds = brute.map { case ((q, _), (v, _)) => (q, v) }.toSet
    val recall = pq.count { case (q, _, v, _) => bruteIds((q, v)) }.toDouble / bruteIds.size
    // measured 0.68 with R=50; 0.90 since round 6's R=100 rerank depth
    assert(recall >= 0.5, s"recall@10 $recall")
  }

  test("sim_ann_ivfpq: cell-restricted ADC beats flat PQ recall here, >= 0.6") {
    val brute = SimilarityQueries.topkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = SimilarityQueries.topkAnnIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 50)
    val recall = got.count(brute).toDouble / brute.size
    // round 5 measured 0.86 (seed centroids, nprobe 4, R 50): probing
    // cells REMOVES spurious global-ADC candidates, so the rerank pool
    // is cleaner than flat PQ's. Round 6 (trained centroids, nprobe 6,
    // R 100) measures 0.90.
    assert(recall >= 0.6, s"recall@10 $recall")
  }

  test("sim_ann_ivfpq_res: residual encoding gives the family's best recall, >= 0.7") {
    val brute = SimilarityQueries.topkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = SimilarityQueries.topkAnnIvfPqRes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 50)
    val recall = got.count(brute).toDouble / brute.size
    // round 5 (seed centroids) observed the Jégou §III progression
    // directly: flat PQ 0.68 → IVF-PQ 0.86 → residual IVFADC 0.90.
    // Round 6 (trained centroids + wider nprobe/R) lifts the whole
    // family to 0.90, so the progression flattens at this tiny NQ=5 —
    // the pin keeps the residual form at the family's ceiling.
    assert(recall >= 0.7, s"recall@10 $recall")
  }

  test("dsir_select skews toward the target language distribution") {
    import spark.implicits._
    val sel = graft.queries.PipelineQueries.dsirSelect(spark, sf)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(sel.size == 100)
    val langs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    val baseEn = langs.count(_._2 == "en").toDouble / langs.length
    val selEn = langs.count { case (id, l) => sel(id) && l == "en" }.toDouble / sel.size
    // importance weighting must over-select the target slice vs the
    // corpus base rate (0.50 vs 0.436 on this deterministic corpus)
    assert(selEn > baseEn, s"selected en=$selEn <= base=$baseEn")
  }

  test("quality_classifier learns: en scores separate from non-en (AUC > 0.55)") {
    val sc = graft.queries.PipelineQueries.qualityClassifier(spark, sf).collect()
      .map(r => (r.getInt(1), r.getDouble(2)))
    val en = sc.filter(_._1 == 1).map(_._2)
    val non = sc.filter(_._1 == 0).map(_._2)
    assert(en.nonEmpty && non.nonEmpty)
    val auc = en.map(e => non.count(n => e > n) + 0.5 * non.count(n => e == n))
      .sum / (en.length.toDouble * non.length)
    // measured 0.6124 after 8 full-batch steps on this weak-signal
    // synthetic corpus; the assertion pins "the loop actually learns"
    assert(auc > 0.55, s"AUC $auc")
    assert(en.sum / en.length > non.sum / non.length)
  }

  test("sim_ann_binary: Hamming candidates rerank exactly, recall@10 pinned") {
    val brute = SimilarityQueries.topkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val bin = SimilarityQueries.topkAnnBinary(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(bin.length == 50)
    // exact rerank: an ANN's k-th best cosine never beats the exact k-th
    bin.foreach { case (q, rank, _, cos) =>
      assert(cos <= brute((q, rank))._2 + 1e-9, s"q=$q rank=$rank ANN beat exact")
    }
    val bruteIds = brute.map { case ((q, _), (v, _)) => (q, v) }.toSet
    val recall = bin.count { case (q, _, v, _) => bruteIds((q, v)) }.toDouble / bruteIds.size
    // 1 bit/dim on near-uniform synthetic vectors: sign patterns carry
    // most of the angle; measured 0.82 at sf0.01 with R=100 rerank
    assert(recall >= 0.6, s"recall@10 $recall")
  }

  test("scd2_history: dense versions, chained intervals, single current row") {
    val rows = graft.queries.BreadthQueries.scd2History(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, hist0) =>
      val hist = hist0.sortBy(_._2)
      // versions are dense 1..n
      assert(hist.map(_._2).toSeq == (1 to hist.length), s"user $user versions")
      // exactly one open (current) row, and it is the last version
      assert(hist.count(_._6) == 1, s"user $user current-count")
      assert(hist.last._6 && hist.last._5.isEmpty, s"user $user last not open")
      hist.sliding(2).foreach {
        case Array(a, b) =>
          // intervals chain with no gaps or overlaps
          assert(a._5.contains(b._4), s"user $user: ${a._5} != ${b._4}")
          // consecutive versions always change the tracked attribute
          assert(a._3 != b._3, s"user $user: no-op version survived")
        case _ => ()
      }
    }
  }

  test("scd2_lookup: every event resolves to exactly one dimension version") {
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    val looked = graft.queries.BreadthQueries.scd2Lookup(spark, sf)
    assert(looked.count() == nEvents, "interval partition violated")
    // and the resolved (event -> version) is unique per event
    assert(looked.select(col("event_id")).distinct().count() == nEvents)
  }

  test("graph_triangles matches a driver-side brute-force count") {
    val out = GraphQueries.triangles(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.head.getLong(3)
    // independent ground truth: rebuild the canonical edge set in plain
    // Scala (test-scale vocab is tiny) and enumerate vertex triples
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val edges = scala.collection.mutable.Set[(String, String)]()
    texts.foreach { t =>
      t.split(" ").sliding(2).foreach {
        case Array(x, y) if x != y =>
          edges += (if (x < y) (x, y) else (y, x)); ()
        case _ => ()
      }
    }
    val es = edges.toSet
    val verts = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triples = verts.combinations(3).filter {
      case Seq(a, b, c) => es((a, b)) && es((a, c)) && es((b, c))
      case _ => false
    }.toSeq
    assert(total == triples.size.toLong, s"total $total != brute ${triples.size}")
    // per-corner credit: spot-check the top word against the enumeration
    val perNode = triples.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val top = out.head
    assert(perNode(top.getString(1)) == top.getLong(2).toInt,
      s"top word ${top.getString(1)} credit mismatch")
  }

  test("dedup_semantic: every cluster keeps at least one representative") {
    import spark.implicits._
    val removed = DedupQueries.semanticDedup(spark, sf)
      .select(col("c_id"), col("vec_id")).as[(Long, Long)].collect()
    assert(removed.nonEmpty) // 55 removals at this sf — non-trivial decision
    assert(removed.map(_._2).distinct.length == removed.length)
    // recompute the cluster assignment with the query's own quantizer
    // and check SemDeDup's survivor guarantee: the member closest to
    // "least central" (min c_cos, then min id) is never removable, so
    // removals per cluster must be strictly below the cluster size
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    // the query's own quantizer (round 6: k-means-trained, not seed)
    val cent = graft.operators.Quantizer.trainedCentroids(spark, e, 16)
    val sizes = e.crossJoin(broadcast(cent))
      .withColumn("c_cos",
        graft.functions.GraftFunctions.cosineSim(spark, col("emb"), col("c_emb")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("c_cos").desc, col("c_id"))))
      .filter(col("rk") === 1)
      .groupBy(col("c_id")).count()
      .as[(Long, Long)].collect().toMap
    removed.groupBy(_._1).foreach { case (c, rs) =>
      assert(rs.length < sizes(c), s"cluster $c removed all ${sizes(c)} members")
    }
  }

  test("KL drift is non-negative (Gibbs) and token mass partitions") {
    val drift = graft.queries.TextQueries.klDrift(spark, sf).collect()
    assert(drift.nonEmpty)
    // KL(p‖q) ≥ 0 for any distributions; the 12-dp quantization of each
    // log-ratio can push a near-zero KL below 0 by at most vocab·1e-12
    drift.foreach { r =>
      assert(r.getAs[Double]("kl_nats") >= -1e-6,
        s"negative KL: ${r.mkString(",")}")
    }
    val corpusTokens = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).count()
    assert(drift.map(_.getAs[Long]("n_tokens")).sum == corpusTokens)
  }
}
