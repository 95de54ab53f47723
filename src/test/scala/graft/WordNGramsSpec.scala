package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.GraftFunctions

/** [[graft.functions.WordNGrams]] must be semantically identical to the
  * built-in higher-order-function spelling it replaces (the codegen'd
  * kernel is a pure performance substitution — cold-run interpreter
  * cost was ~15× — so equivalence IS the contract).
  */
class WordNGramsSpec extends SparkSpec {
  import spark.implicits._

  /** The interpreted reference spelling the expression replaces. */
  private def hofNGrams(ws: org.apache.spark.sql.Column, n: Int) =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(97L + i)))

  test("matches the HOF spelling on arbitrary token arrays, n in 1..4") {
    val tok = Gen.oneOf("a", "b", "ab", "xyz", "", "q1")
    val arrGen = Gen.listOf(tok)
    val cases = samples(arrGen, 60)
    val df = cases.toDF("ws")
    for (n <- 1 to 4) {
      val got = df.select(
        GraftFunctions.wordNGrams(spark, col("ws"), n).as("native"),
        hofNGrams(col("ws"), n).as("hof")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("edge cases: empty, shorter than n, exactly n") {
    val df = Seq(
      (1, Seq.empty[String]),
      (2, Seq("solo")),
      (3, Seq("two", "words")),
      (4, Seq("a", "b", "c"))).toDF("id", "ws")
    val out = df.select(col("id"),
        GraftFunctions.wordNGrams(spark, col("ws"), 2).as("bi"))
      .orderBy(col("id")).collect()
    assert(out(0).getSeq[String](1) == Seq.empty)
    assert(out(1).getSeq[String](1) == Seq.empty)
    assert(out(2).getSeq[String](1) == Seq("two words"))
    assert(out(3).getSeq[String](1) == Seq("a b", "b c"))
  }

  test("null array yields null; SQL registration works") {
    GraftFunctions.ensureRegistered(spark)
    val out = spark.sql(
      "SELECT graft_word_ngrams(CAST(NULL AS ARRAY<STRING>), 2) AS g").collect()
    assert(out(0).isNullAt(0))
    val out2 = spark.sql(
      "SELECT graft_word_ngrams(array('x','y','z'), 3) AS g").collect()
    assert(out2(0).getSeq[String](0) == Seq("x y z"))
  }

  test("interpreted eval agrees with codegen (explicit fallback path)") {
    // the codegen path is exercised by the DataFrame tests above;
    // eval() is what Literal folding and interpreted fallback use
    val e = graft.functions.WordNGrams(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("u", "v", "w"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 2)
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(got.numElements() == 2)
    assert(got.getUTF8String(0).toString == "u v")
    assert(got.getUTF8String(1).toString == "v w")
  }
}
