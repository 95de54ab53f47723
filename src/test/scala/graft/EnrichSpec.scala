package graft

import org.apache.spark.sql.functions._
import graft.operators.Enrich

/** The enrichment aggregates against hand-computed values, plus the
  * exact-rounding helper at its adversarial midpoint.
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("metrics matches hand computation (A1-A5)") {
    // author X: ratings 4.0(w10), 3.0(w30) → wavg = (40+90)/40 = 3.25
    //           prices 10.00, 20.00 → avg 15.0
    val books = Seq(
      ("X", 4.0, 10, 10.00), ("X", 3.0, 30, 20.00), ("Y", 5.0, 2, 8.50),
    ).toDF("author", "rating", "rating_count", "price")
    val m = Enrich.metrics(books, Seq(col("author")),
      valueCol = col("rating"), valueScale = 1,
      weightCol = col("rating_count"), priceCol = col("price"))
      .orderBy("author").collect()
    assert(m(0).getAs[Double]("sum_rating_count_rating") == 130.0)
    assert(m(0).getAs[Double]("total_rating_count") == 40.0)
    assert(m(0).getAs[Double]("average_rating") == 3.25)
    assert(m(0).getAs[Double]("average_price") == 15.0)
    assert(m(0).getAs[Long]("book_count") == 2L)
    assert(m(1).getAs[Double]("average_rating") == 5.0)
  }

  test("roundDiv4 rounds HALF_UP at exact midpoints") {
    // 1080682.23 / 24 = 45028.42625 — exactly on the 4-decimal midpoint
    // (the case that broke round(sum/count,4) across engines)
    val df = Seq((108068223L, 2400L)).toDF("n", "d")
    val v = df.select(Enrich.roundDiv4(col("n"), col("d")).as("q"))
      .head().getDouble(0)
    assert(v == 45028.4263) // HALF_UP, not half-even's ...4262
  }

  test("roundDiv4 equals plain rounding away from midpoints") {
    val cases = Seq((10L, 3L, 3.3333), (1L, 7L, 0.1429), (22L, 7L, 3.1429))
    cases.foreach { case (n, d, want) =>
      val v = Seq((n, d)).toDF("n", "d")
        .select(Enrich.roundDiv4(col("n"), col("d"))).head().getDouble(0)
      assert(v == want, s"$n/$d")
    }
  }

  test("metrics is partitioning-independent (exact sums)") {
    val df = spark.range(1000).select(
      (col("id") % 7).as("g"),
      (col("id") % 100).cast("double").as("rating"),
      lit(3).as("rating_count"),
      (col("id") % 31).cast("double").as("price"))
    def run(parts: Int) = Enrich.metrics(df.repartition(parts), Seq(col("g")),
      col("rating"), 2, col("rating_count"), col("price"))
      .orderBy("g").collect().toSeq
    assert(run(1) == run(13))
  }
}
