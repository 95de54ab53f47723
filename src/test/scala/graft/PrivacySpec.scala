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
}
