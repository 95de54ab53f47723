package graft

import org.apache.spark.sql.functions._
import graft.operators.{Enrich, Standardise}

/** SURVEY §5 item 4 — the golden end-to-end pipeline test: a frozen
  * FIXTURES.md §A1-shaped dirty frame through standardise → enrich,
  * compared to hand-computed golden outputs (the data-correctness test
  * the reference never had; its `test_dag.py` checks DAG shape only —
  * and is stale, asserting 5 of 6 tasks).
  */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  // the A1 fixture: dup titles (one whitespace-dirtied), an
  // unparseable rating, thousands separators, two multi-book authors
  private def rawBooks = Seq(
    ("  Dune  ", "Herbert", "Paperback", "12.50", "4.0 out of 5 stars", "100"),
    ("Dune", "Herbert", "Kindle", "99.99", "1.0 out of 5 stars", "999,999"), // dup: dropped
    ("Messiah", "Herbert", "Hardcover", "20.00", "3.0 out of 5 stars", "300"),
    ("Neuromancer", "Gibson", "Paperback", "15.00", "not rated", "50"), // null rating
    ("Count Zero", "Gibson", "Paperback", "10.00", "2.5 out of 5 stars", "1,000"),
    ("I, Robot", "Asimov", "Kindle", "7.25", "5.0 out of 5 stars", "2,000"),
  ).toDF("title", "author", "book_type", "price", "rating", "rating_count")

  private def standardised = {
    val cleaned = rawBooks.withColumn("title", Standardise.trimmed(col("title")))
    Standardise.dedupFirst(cleaned,
      key = Seq(col("title")),
      order = Seq(col("price")))
      .select(col("title"), col("author"), col("book_type"),
        Standardise.parsePrice(col("price")).as("price"),
        Standardise.extractRating(col("rating")).as("rating"),
        Standardise.parseCount(col("rating_count")).as("rating_count"))
  }

  test("standardise golden: dedup keeps first-by-price, casts and nulls land exactly") {
    val rows = standardised.orderBy("title").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3),
        Option(r.get(4)), r.getInt(5)))
    assert(rows.toSeq == Seq(
      ("Count Zero", "Gibson", 10.00, Some(2.5), 1000),
      ("Dune", "Herbert", 12.50, Some(4.0), 100), // "12.50" < "99.99"
      ("I, Robot", "Asimov", 7.25, Some(5.0), 2000),
      ("Messiah", "Herbert", 20.00, Some(3.0), 300),
      ("Neuromancer", "Gibson", 15.00, None, 50),
    ))
  }

  test("enrich golden: per-author weighted metrics match hand computation") {
    val m = Enrich.metrics(
      standardised.filter(col("rating").isNotNull),
      Seq(col("author")),
      valueCol = col("rating"), valueScale = 1,
      weightCol = col("rating_count"), priceCol = col("price"))
      .orderBy("author").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(m.toSeq == Seq(
      // Asimov: 5.0·2000=10000; avg 5.0; price 7.25; 1 book
      ("Asimov", 10000.0, 2000.0, 5.0, 7.25, 1L),
      // Gibson: 2.5·1000=2500 (Neuromancer rating null → excluded)
      ("Gibson", 2500.0, 1000.0, 2.5, 10.0, 1L),
      // Herbert: 4.0·100 + 3.0·300 = 1300; 1300/400 = 3.25;
      //          avg price (12.50+20.00)/2 = 16.25; 2 books
      ("Herbert", 1300.0, 400.0, 3.25, 16.25, 2L),
    ))
  }
}
