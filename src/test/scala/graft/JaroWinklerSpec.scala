package graft

import graft.functions.{GraftFunctions, JaroWinklerAlgo}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[JaroWinklerAlgo]] to the textbook values and to DuckDB's
  * `jaro_winkler_similarity` behavior (probed 2026-08-13):
  * boost only above the 0.7 Jaro threshold, prefix capped at 4,
  * scale 0.1. The cross-engine agreement over the whole part-name
  * dictionary is enforced by the `join_fuzzy_jw` oracle gate.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private def jw(a: String, b: String) = JaroWinklerAlgo.compute(a, b)

  test("textbook values match DuckDB") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
  }

  test("edges: identity, empty, disjoint") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
  }

  test("boost applies only above the 0.7 jaro threshold") {
    // common prefixes, but jaro <= 0.7 → DuckDB leaves them unboosted
    assert(math.abs(jw("abcdef", "abxxxx") - 0.5555555555555555) < 1e-12)
    assert(math.abs(jw("abcdefgh", "abcdxxxx") - 0.6666666666666666) < 1e-12)
    assert(math.abs(jw("ab", "ax") - 0.6666666666666666) < 1e-12)
  }

  test("non-BMP input counts code points, not UTF-16 units") {
    // each astral char is 1 code point (2 UTF-16 units): the astral
    // string must score exactly like its ASCII analog
    assert(jw("𝕏𝕐ab", "𝕐𝕏ab") == jw("xyab", "yxab"))
    // m=4, t=2 → jaro=(1+1+3/4)/3; no common prefix → unboosted
    assert(math.abs(jw("𝕏𝕐ab", "𝕐𝕏ab") - (1.0 + 1.0 + 0.75) / 3.0) < 1e-12)
    // one astral char vs another: disjoint singletons → 0
    assert(jw("𝕏", "𝕐") == 0.0)
  }

  test("codegen path equals the interpreted kernel") {
    val spark = SparkSpec.session
    val df = spark.createDataFrame(Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("red widget", "red widgets")
    )).toDF("a", "b")
    val rows = df.select(GraftFunctions.jaroWinkler(spark, col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    val expected = Seq(jw("martha", "marhta"), jw("dixon", "dicksonx"),
      jw("red widget", "red widgets"))
    assert(rows.toSeq == expected)
  }
}
