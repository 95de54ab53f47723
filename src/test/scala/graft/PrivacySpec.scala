package graft

import graft.queries.PrivacyQueries
import graft.sources.Tables

/** The k-anonymity guarantees the class-table hash gate implies but
  * doesn't state: k-floor on every published class, partition of the
  * population (nothing lost or double-counted across escalation
  * levels), and the generalization ladder's shape.
  */
class PrivacySpec extends SparkSpec {

  private val K = 8

  private lazy val out = PrivacyQueries.privacyKanon(spark, sf).collect()

  test("every published class meets the k floor") {
    out.filter(_.getAs[Int]("level") < 3).foreach { r =>
      assert(r.getAs[Long]("n") >= K,
        s"under-k class published: ${r.mkString(",")}")
    }
  }

  test("classes partition the customer population exactly") {
    val total = Tables.customer(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
  }

  test("generalization ladder masks the right columns per level") {
    out.foreach { r =>
      val (geo, bucket, lvl) = (r.getAs[String]("geo"),
        r.getAs[String]("bal_bucket"), r.getAs[Int]("level"))
      lvl match {
        case 0 => assert(geo != "*" && bucket != "*")
        case 1 | 2 => assert(geo != "*" && bucket == "*")
        case 3 => assert(geo == "*" && bucket == "*" &&
          r.getAs[String]("segment") == "*")
      }
    }
  }

  test("no class key is published at two levels (local recoding)") {
    // a (geo, segment) pair finalized at level 1 must not also appear
    // at level 2 via the region path under the same segment — levels
    // use disjoint row populations, and level-0 keys are strictly finer
    val l01 = out.filter(r => r.getAs[Int]("level") <= 1)
      .map(r => (r.getAs[String]("geo"), r.getAs[String]("segment"),
        r.getAs[String]("bal_bucket")))
    assert(l01.distinct.length == l01.length)
  }

  // ---- l-diversity audit ------------------------------------------------

  test("l-diversity classes partition the population; l is consistent") {
    val ld = PrivacyQueries.privacyLDiversity(spark, sf).collect()
    assert(ld.nonEmpty)
    assert(ld.map(_.getAs[Long]("n")).sum ==
      Tables.customer(spark, sf).count())
    ld.foreach { r =>
      val (n, l) = (r.getAs[Long]("n"), r.getAs[Long]("l"))
      assert(l >= 1 && l <= n, s"class ${r.mkString(",")}")
      // bal buckets span [-1000, 9000] in $1000 steps: at most 11 values
      assert(l <= 11)
      assert(r.getAs[Boolean]("diverse") == (l >= 3))
    }
  }

  // ---- randomized response ----------------------------------------------

  test("randomized-response debias algebra holds on every published row") {
    val rr = PrivacyQueries.privacyRrEstimate(spark, sf).collect()
    assert(rr.nonEmpty)
    rr.foreach { r =>
      val (n, rep) = (r.getAs[Long]("n"), r.getAs[Long]("n_reported"))
      val want = BigDecimal((rep * 8 - n).toDouble / (n * 6).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("est_rate") - want) < 1e-9)
    }
  }

  test("randomized-response estimator recovers the population rate") {
    val rr = PrivacyQueries.privacyRrEstimate(spark, sf).collect()
    val n = rr.map(_.getAs[Long]("n")).sum
    assert(n == Tables.customer(spark, sf).count())
    val rep = rr.map(_.getAs[Long]("n_reported")).sum
    val est = (rep * 8 - n).toDouble / (n * 6).toDouble
    val tru = rr.map(r =>
      r.getAs[Double]("true_rate") * r.getAs[Long]("n")).sum / n
    // estimator sd ≈ (4/3)·0.5/√n ≈ 0.054 at n≈150 — 4σ envelope
    assert(math.abs(est - tru) < 0.25,
      s"debiased $est vs true $tru over $n respondents")
  }
}
