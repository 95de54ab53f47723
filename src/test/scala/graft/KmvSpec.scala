package graft

import graft.functions.{KmvDistinct, KmvState}
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-contract tests for [[KmvDistinct]]: bounded state, order- and
  * partitioning-independence (the property that makes the estimate
  * deterministic under Spark's arbitrary partial-aggregation order),
  * the exact small-cardinality path, and the error envelope.
  */
class KmvSpec extends AnyFunSuite {
  private def hash(x: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(x.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    java.lang.Long.parseLong(hex, 16)
  }

  test("state is bounded by K and stays sorted-distinct") {
    val s = (1L to 10000L).map(hash).foldLeft(KmvDistinct.zero)(KmvDistinct.reduce)
    assert(s.mins.length == KmvDistinct.K)
    assert(s.mins.toSeq == s.mins.toSeq.distinct.sorted)
  }

  test("estimate is independent of input order and partitioning") {
    val hs = (1L to 5000L).map(hash)
    val sequential = hs.foldLeft(KmvDistinct.zero)(KmvDistinct.reduce)
    val shuffled = scala.util.Random.shuffle(hs).foldLeft(KmvDistinct.zero)(KmvDistinct.reduce)
    val merged = hs.grouped(137).toSeq
      .map(_.foldLeft(KmvDistinct.zero)(KmvDistinct.reduce))
      .reduce(KmvDistinct.merge)
    assert(KmvDistinct.finish(sequential) == KmvDistinct.finish(shuffled))
    assert(KmvDistinct.finish(sequential) == KmvDistinct.finish(merged))
  }

  test("fewer than K distinct values is exact, duplicates ignored") {
    val hs = (1L to 100L).map(hash)
    val s = (hs ++ hs ++ hs).foldLeft(KmvDistinct.zero)(KmvDistinct.reduce)
    assert(KmvDistinct.finish(s) == 100.0)
  }

  test("estimate lands within 3/sqrt(K) of the truth") {
    val n = 20000
    val s = (1L to n.toLong).map(hash).foldLeft(KmvDistinct.zero)(KmvDistinct.reduce)
    val est = KmvDistinct.finish(s)
    val bound = 3.0 / math.sqrt(KmvDistinct.K.toDouble)
    assert(math.abs(est - n) / n < bound, s"est=$est n=$n bound=$bound")
  }
}
