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

  // ---------------------------------------- sequential merge training

  test("merge training matches an independent in-JVM Sennrich trainer") {
    // oracle-independent cross-check of text_bpe_train: rebuild the
    // word-frequency table and run the reference algorithm in plain
    // Scala — explicit left-to-right non-overlapping pair merging —
    // then compare the full merge list exactly. The engine's
    // delimited-string replace must agree with this fold on every
    // round (including merges-of-merges and overlapping-pair rounds).
    val wf = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w")
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var syms = wf.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val expected = (1 to graft.queries.TextQueries.BPE_MERGES).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (ts, f) =>
        ts.sliding(2).foreach {
          case Seq(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      syms = syms.map { case (ts, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += ts(i); i += 1 }
        }
        (out.result(), f)
      }
      (r, a, b, a + b, c)
    }
    val got = graft.queries.TextQueries.bpeTrain(spark, sf).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("cnt"))).toSeq
    assert(got == expected)
    // later rounds must be building on earlier merges (a merged token
    // appearing as a side of a later pair) — the property that
    // distinguishes the sequential algorithm from one-pass ranking
    val mergedToks = got.map(_._4).toSet
    assert(got.exists(m => mergedToks.contains(m._2) || mergedToks.contains(m._3)),
      "no round merged a previously-merged token; corpus too trivial?")
  }
}
