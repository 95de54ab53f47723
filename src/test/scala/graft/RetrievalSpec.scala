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
}
