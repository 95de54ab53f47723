package graft

import org.apache.spark.sql.functions._
import graft.queries.RetrievalQueries

/** Properties of the hybrid-RRF fusion the oracle's hash gate implies
  * but doesn't state: the fusion arithmetic, the rank discipline, and
  * the both-legs-beat-one-leg ordering RRF exists to provide.
  */
class RetrievalSpec extends SparkSpec {

  private lazy val out =
    RetrievalQueries.hybridRrf(spark, sf).collect()

  test("fused score is exactly the two-leg RRF sum") {
    assert(out.nonEmpty)
    out.foreach { r =>
      val lex = Option(r.getAs[Any]("lex_rank")).map(_.asInstanceOf[Int])
      val sem = Option(r.getAs[Any]("sem_rank")).map(_.asInstanceOf[Int])
      assert(lex.nonEmpty || sem.nonEmpty, "row surfaced by neither leg")
      val want = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      val got = r.getAs[Double]("rrf")
      assert(math.abs(got - BigDecimal(want)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"rrf mismatch for doc ${r.getAs[Long]("doc_id")}: $got vs $want")
    }
  }

  test("result is rrf-descending with doc_id tie-break, ranks in 1..50") {
    val keys = out.map(r =>
      (-r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted), "output not in fused order")
    out.foreach { r =>
      Seq("lex_rank", "sem_rank").foreach { c =>
        Option(r.getAs[Any](c)).map(_.asInstanceOf[Int]).foreach(v =>
          assert(v >= 1 && v <= 50, s"$c out of candidate depth: $v"))
      }
    }
  }

  test("a doc surfaced by both legs outranks the same ranks taken singly") {
    // RRF's point: agreement across retrievers compounds. Construct the
    // check from the output itself — any both-legs doc must score
    // strictly above a hypothetical doc holding just ONE of its ranks.
    val both = out.filter(r =>
      r.getAs[Any]("lex_rank") != null && r.getAs[Any]("sem_rank") != null)
    assert(both.nonEmpty, "fixture corpus produced no two-leg overlap")
    both.foreach { r =>
      val l = r.getAs[Int]("lex_rank"); val s = r.getAs[Int]("sem_rank")
      val fused = r.getAs[Double]("rrf")
      assert(fused > 1.0 / (60 + l) && fused > 1.0 / (60 + s))
    }
  }

  test("semantic leg excludes the query vector itself") {
    assert(!out.exists(r => r.getAs[Long]("doc_id") == 0L &&
      r.getAs[Any]("sem_rank") != null))
  }

  // ------------------------------------------------------------- MMR

  private lazy val mmr = RetrievalQueries.searchMmr(spark, sf).collect()

  test("mmr emits K ranked, distinct, self-excluding picks per query") {
    val byQ = mmr.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("mmr_rank")).sorted.sameElements(1 to 5))
      val docs = rows.map(_.getAs[Long]("doc_id"))
      assert(docs.distinct.length == docs.length, s"qid=$qid repeated a doc")
      assert(!docs.contains(qid), s"qid=$qid selected itself")
    }
  }

  test("selected marginal scores are non-increasing within a query") {
    // greedy invariant: the step-i winner's marginal can only shrink as
    // the selected set grows and the candidate pool drains
    mmr.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      val scores = rows.sortBy(_.getAs[Int]("mmr_rank")).map(_.getAs[Double]("mmr"))
      scores.sliding(2).foreach { case Array(a, b) =>
        assert(a >= b, s"qid=$qid marginal rose: $a -> $b")
      }
    }
  }

  test("catalyst-loop selection matches an independent in-JVM greedy") {
    // oracle-independent cross-check: rebuild pools + run the greedy in
    // plain Scala with the same left-to-right double arithmetic
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) AS emb")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 5L).flatMap { qid =>
      val q = vecs(qid)
      val pool = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(20)
      var selected = Vector.empty[(Long, Int, Double)]
      var remaining = pool
      for (step <- 1 to 5) {
        val scored = remaining.map { case (id, simQ) =>
          val maxS = if (selected.isEmpty) 0.0
          else selected.map(s => cos(vecs(id), vecs(s._1))).max
          (id, 0.7 * simQ - 0.3 * maxS)
        }
        val (pickId, pickScore) = scored.minBy { case (id, s) => (-s, id) }
        selected :+= ((pickId, step, pickScore))
        remaining = remaining.filterNot(_._1 == pickId)
      }
      selected.map { case (id, step, s) =>
        (qid, id, step,
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
    val got = mmr.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"),
      r.getAs[Int]("mmr_rank"), r.getAs[Double]("mmr"))).toSet
    assert(got == expected)
  }

  // ------------------------------------------- RAG serving index layout

  test("rag postings leg is a bucket-pruned lookup; sidecars stay hidden") {
    val (idx, _) = RetrievalQueries.ragServingIndex(spark, sf)
    // the semantic read never lists the sidecars (the `_` hidden-path
    // convention): its schema is exactly the inverted-list columns
    assert(spark.read.parquet(idx).columns.sorted
      .sameElements(Array("c_id", "cid", "dl", "emb")))
    // the serve-path postings scan carries a LITERAL pb partition
    // filter, so unqueried buckets are pruned at file-listing time
    val posts = RetrievalQueries.ragPostings(spark, idx)
    val scan = posts.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("_postings")).getOrElse(
        fail("no postings scan leaf in the serve plan"))
    assert(scan.contains("PartitionFilters: [pb"),
      s"no literal pb partition filter on the postings scan:\n$scan")
    // |terms| terms can touch at most |terms| of the RAG_PB buckets
    val touched = posts.select("pb").distinct().count()
    assert(touched <= RetrievalQueries.RAG_TERMS.size)
    val total = spark.read.parquet(s"$idx/_postings")
      .select("pb").distinct().count()
    assert(touched < total, "pruning read every postings bucket")
  }

  test("postings sidecar agrees with a full chunk-scan recompute") {
    val (idx, _) = RetrievalQueries.ragServingIndex(spark, sf)
    val ch = RetrievalQueries.ragChunkFrame(spark, sf)
      .select(col("cid"), col("dl"), col("cws")).cache()
    // corpus stats: the _stats partials aggregate to exactly what a
    // full scan computes — and the derived avgdl is BIT-identical to
    // avg(dl) (integral dl: both are exact-long-sum over count)
    val stats = graft.queries.RetrievalQueries.ragReadStats(spark, idx)
      .collect().head
    val n = ch.count()
    assert(stats.getAs[Double]("n") == n.toDouble)
    assert(stats.getAs[Double]("avgdl") ==
      ch.agg(avg(col("dl"))).collect().head.getDouble(0))
    // per query term: df (postings rows = chunks containing it) and
    // total tf from the PRUNED serve read equal a chunk rescan
    RetrievalQueries.RAG_TERMS.foreach { t =>
      val p = RetrievalQueries.ragPostings(spark, idx)
        .filter(col("word") === t)
        .agg(count(lit(1)).as("df"),
          coalesce(sum(col("tf")), lit(0L)).as("tf"))
        .collect().head
      val c = ch.select(size(filter(col("cws"), w => w === lit(t))).as("tf"))
        .agg(sum(when(col("tf") > 0, 1).otherwise(0)).as("df"),
          sum(col("tf")).as("tf"))
        .collect().head
      assert(p.getAs[Long]("df") == c.getAs[Long]("df"),
        s"df mismatch for '$t'")
      assert(p.getAs[Long]("tf") == c.getAs[Long]("tf"),
        s"tf mismatch for '$t'")
    }
    ch.unpersist()
  }
}
