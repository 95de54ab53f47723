package graft

import org.apache.spark.sql.functions._
import graft.operators.Standardise

/** Per-operator checks for the cleaning stage, against the reference's
  * documented semantics (`/root/reference/dags/dag.py:126-149`) on a
  * FIXTURES.md §A1-shaped dirty frame.
  */
class StandardiseSpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    ("  Dune  ", "Herbert", "43", "4.5 out of 5 stars", "1,234"),
    ("Dune", "Herbert", "58.99", "4.5 out of 5 stars", "1,234"),
    ("Neuromancer", "Gibson", "19.99", "not rated", "77"),
    ("Foundation", "Asimov", "25", "3.9 out of 5 stars", "12,345"),
  ).toDF("title", "author", "price", "rating", "rating_count")

  test("trim + regex extract + comma strip + casts (P3-P7)") {
    val out = dirty.select(
      Standardise.trimmed(col("title")).as("title"),
      Standardise.parsePrice(col("price")).as("price"),
      Standardise.extractRating(col("rating")).as("rating"),
      Standardise.parseCount(col("rating_count")).as("rating_count"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)), r.getInt(3)))
    assert(out(0) == ("Dune", 43.0, Some(4.5), 1234))
    assert(out(1) == ("Dune", 58.99, Some(4.5), 1234))
    assert(out(2) == ("Neuromancer", 19.99, None, 77)) // "not rated" → null
    assert(out(3) == ("Foundation", 25.0, Some(3.9), 12345))
  }

  test("dedupFirst keeps exactly the first row per key by explicit order (P2/S4)") {
    val deduped = Standardise.dedupFirst(
      dirty.select(Standardise.trimmed(col("title")).as("title"),
        col("price")),
      key = Seq(col("title")), order = Seq(col("price")))
    val rows = deduped.orderBy("title").collect()
    assert(rows.length == 3)
    // "43" < "58.99" lexicographically AND numerically — first wins
    assert(rows.find(_.getString(0) == "Dune").get.getString(1) == "43")
  }

  test("dedupFirst is idempotent") {
    val once = Standardise.dedupFirst(dirty, Seq(trim(col("title"))),
      Seq(col("price")))
    val twice = Standardise.dedupFirst(once, Seq(trim(col("title"))),
      Seq(col("price")))
    assert(once.count() == twice.count())
  }

  test("requireNonEmpty throws on empty input (P1)") {
    val empty = dirty.filter(col("price") === "nope")
    val e = intercept[IllegalStateException] {
      Standardise.requireNonEmpty(empty, "books")
    }
    assert(e.getMessage.contains("books"))
    assert(Standardise.requireNonEmpty(dirty, "books").count() == 4)
  }
}
