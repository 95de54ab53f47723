package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.JdbcSink

/** JDBC sink capability (reference K2/K3: `dags/dag.py:198-227` loads
  * books + enriched metrics into Postgres). Exercised against
  * embedded in-memory Derby — same Spark code path as a server RDBMS,
  * no network needed.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def books = Seq(
    ("Dune", "Frank Herbert", 9.99, 4.5, 1200),
    ("Hyperion", "Dan Simmons", 12.50, 4.7, 800),
    ("Solaris", "Stanislaw Lem", 8.75, 4.2, 450),
  ).toDF("title", "author", "price", "rating", "rating_count")

  test("books round-trip through a JDBC table (overwrite mode)") {
    JdbcSink.write(books, url, "books", driver)
    val back = JdbcSink.read(spark, url, "books", driver)
    assert(back.columns.toSet == books.columns.toSet)
    assert(back.count() == 3)
    val rows = back.orderBy("title").select("title", "author", "price")
      .as[(String, String, Double)].collect().toSeq
    assert(rows == Seq(
      ("Dune", "Frank Herbert", 9.99),
      ("Hyperion", "Dan Simmons", 12.50),
      ("Solaris", "Stanislaw Lem", 8.75)))
  }

  test("overwrite is idempotent; append accumulates (the reference's reload vs incremental load)") {
    JdbcSink.write(books, url, "books_mode", driver)
    JdbcSink.write(books, url, "books_mode", driver) // rerun: same rows
    assert(JdbcSink.read(spark, url, "books_mode", driver).count() == 3)
    JdbcSink.write(books, url, "books_mode", driver, mode = SaveMode.Append)
    assert(JdbcSink.read(spark, url, "books_mode", driver).count() == 6)
  }

  test("enriched metrics land with aggregate schema intact (K3 shape)") {
    val enriched = books.groupBy("author").agg(
      round(avg(col("rating")), 2).as("average_rating"),
      sum(col("rating_count")).as("total_rating_count"),
      count(lit(1)).as("book_count"))
    JdbcSink.write(enriched, url, "enriched_books", driver,
      columnTypes = Some("author VARCHAR(128)"))
    val back = JdbcSink.read(spark, url, "enriched_books", driver)
    assert(back.count() == 3)
    assert(back.columns.toSet ==
      Set("author", "average_rating", "total_rating_count", "book_count"))
    val dune = back.filter(col("author") === "Frank Herbert")
      .select("total_rating_count").as[Long].head()
    assert(dune == 1200L)
  }
}
