package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Dedup

/** The native codegen'd cosine expression must be bit-identical to the
  * portable-cosine contract (sequential double accumulation) in BOTH
  * interpreted and whole-stage-codegen execution.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.1, -0.2, 0.3, 0.05), Seq(-0.4, 0.5, 0.6, 0.9)),
    (Seq(1.0, 0.0), Seq(1.0, 0.0)),
  ).toDF("a", "b")

  private def reference(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.zip(b).foreach { case (x, y) => dot += x * y; na += x * x; nb += y * y }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("matches sequential double accumulation bitwise") {
    val got = pairs
      .select(col("a"), col("b"), GraftFunctions.cosineSim(spark, col("a"), col("b")).as("c"))
      .collect()
    got.foreach { r =>
      val want = reference(r.getSeq[Double](0), r.getSeq[Double](1))
      assert(r.getDouble(2) == want) // ==, not approx
    }
  }

  test("codegen and interpreted paths agree with the zip_with/aggregate form") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = pairs.select(GraftFunctions.cosineSim(spark, col("a"), col("b")))
        .as[Double].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val codegen = pairs.select(GraftFunctions.cosineSim(spark, col("a"), col("b")))
        .as[Double].collect().toSeq
      val hof = pairs.select(
        (Dedup.dot(col("a"), col("b")) /
          (sqrt(Dedup.dot(col("a"), col("a"))) * sqrt(Dedup.dot(col("b"), col("b")))))
        ).as[Double].collect().toSeq
      assert(interp == codegen)
      assert(interp == hof)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null inputs yield null; identical vectors yield 1.0") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    assert(df.select(GraftFunctions.cosineSim(spark, col("a"), col("b")))
      .head().isNullAt(0))
    val same = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(GraftFunctions.cosineSim(spark, col("a"), col("b")))
      .head().getDouble(0)
    assert(same == 1.0)
  }

  test("registered via SparkSessionExtensions path (SQL name resolves)") {
    GraftFunctions.ensureRegistered(spark)
    val v = spark.sql(
      "SELECT graft_cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d))")
      .head().getDouble(0)
    assert(v == 0.0)
  }
}
