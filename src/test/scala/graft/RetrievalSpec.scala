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
}
