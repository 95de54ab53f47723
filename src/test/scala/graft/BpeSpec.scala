package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Contract of the native greedy-BPE-encode expression: round-trip
  * decode, greedy longest-match order, single-char fallback, and the
  * codegen/interpreted parity the whole-stage-codegen path relies on.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  private val vocab = Seq("th", "the", "ing", "qu", "ick", "brown", "ss")

  private def encode(words: Seq[String]): Map[String, Seq[String]] = {
    import spark.implicits._
    words.toDF("w")
      .withColumn("toks",
        GraftFunctions.bpeEncode(spark, col("w"), typedlit(vocab)))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
  }

  test("round-trip: concat(tokens) == word, for every word") {
    val words = Seq("the", "thinking", "quickness", "brown", "zzz", "a",
      "", "theicking", "missing", "thethethe")
    val got = encode(words)
    words.foreach { w =>
      assert(got(w).mkString("") == w, s"round-trip failed for '$w'")
    }
  }

  test("greedy longest-match: longest vocab token wins at each position") {
    val got = encode(Seq("the", "thing", "quick", "brownie"))
    // 'the' (len 3) beats 'th' (len 2)
    assert(got("the") == List("the"))
    // position 0: 'th' matches but 'the' doesn't ('thi...') -> th + ing
    assert(got("thing") == List("th", "ing"))
    assert(got("quick") == List("qu", "ick"))
    assert(got("brownie") == List("brown", "i", "e"))
  }

  test("single-char fallback and empty input") {
    val got = encode(Seq("xyz", ""))
    assert(got("xyz") == List("x", "y", "z"))
    assert(got("") == Nil)
  }

  test("greedy is NOT optimal and that's the contract: overlap case") {
    // 'ssss' -> ss + ss (greedy pairs), 'sss' -> ss + s (fallback tail)
    val got = encode(Seq("ssss", "sss"))
    assert(got("ssss") == List("ss", "ss"))
    assert(got("sss") == List("ss", "s"))
  }

  test("interpreted eval matches the codegen'd path") {
    // filter(...) over an exploded column goes through eval; the
    // projection path above is codegen — both must agree
    val expr = graft.functions.BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("thinking"),
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          vocab.map(org.apache.spark.unsafe.types.UTF8String.fromString)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    val evaled = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val viaEval = (0 until evaled.numElements())
      .map(i => evaled.getUTF8String(i).toString).toList
    // 'th' at 0 ('thi'/'the' miss), fallbacks i/n/k, then 'ing'
    assert(viaEval == List("th", "i", "n", "k", "ing"))
    assert(viaEval == encode(Seq("thinking"))("thinking"))
  }
}
