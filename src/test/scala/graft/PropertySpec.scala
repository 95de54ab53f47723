package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Enrich, Standardise}

/** Property-based checks (SURVEY §5 strategy item 2): algebraic laws
  * the operators must satisfy on arbitrary inputs, not just fixtures.
  * (No scalatestplus bridge in the offline cache, so properties sample
  * ScalaCheck generators from a FIXED seed — deterministic cases,
  * same laws.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("roundDiv4 equals BigDecimal HALF_UP for arbitrary n/d") {
    val cases = samples(Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 9999L)), 60)
    val df = cases.toDF("n", "d")
    val got = df.select(col("n"), col("d"),
      Enrich.roundDiv4(col("n"), col("d")).as("q")).collect()
    got.foreach { r =>
      val (n, d) = (r.getLong(0), r.getLong(1))
      val want = BigDecimal(n).bigDecimal
        .divide(BigDecimal(d).bigDecimal, 4, java.math.RoundingMode.HALF_UP)
        .doubleValue()
      assert(r.getDouble(2) == want, s"n=$n d=$d")
    }
  }

  test("weighted mean lies within [min, max] of the values") {
    val listGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 50).map(_ / 10.0), Gen.chooseNum(1, 1000)))
    samples(listGen, 12).foreach { vs =>
      val df = vs.toDF("rating", "rating_count")
        .withColumn("author", lit("x")).withColumn("price", lit(1.0))
      val avg = Enrich.metrics(df, Seq(col("author")),
        col("rating"), 1, col("rating_count"), col("price"))
        .head().getAs[Double]("average_rating")
      val lo = vs.map(_._1).min
      val hi = vs.map(_._1).max
      assert(avg >= lo - 0.0001 && avg <= hi + 0.0001, s"$avg not in [$lo,$hi]")
    }
  }

  test("dedupFirst is idempotent, keys unique, first-wins by order column") {
    val listGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0, 100)))
    samples(listGen, 12).foreach { vs =>
      val df = vs.toDF("k", "v")
      val once = Standardise.dedupFirst(df, Seq(col("k")), Seq(col("v")))
      val twice = Standardise.dedupFirst(once, Seq(col("k")), Seq(col("v")))
      val got = once.collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
      assert(got == twice.collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq)
      assert(got.map(_._1).distinct.size == got.size)
      // first-wins: each key keeps its minimal v (v is the only order col)
      val want = vs.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).min) }
        .toSeq.sorted
      assert(got == want)
    }
  }
}
