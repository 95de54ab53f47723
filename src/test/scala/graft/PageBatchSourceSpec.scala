package graft

import graft.sources.PageStreamProvider
import org.apache.spark.sql.functions._

/** The batch face of the custom DSv2 page source: predicates on `page`
  * prune partitions AT THE SOURCE (unmatched pages are never planned,
  * i.e. a real paged API would never be fetched), projection reaches
  * the reader, and residual predicates still evaluate correctly in
  * Spark.
  */
class PageBatchSourceSpec extends SparkSpec {
  private def pages(n: Int) = spark.read
    .format(classOf[PageStreamProvider].getName)
    .option("pages", n.toString).option("rowsPerPage", "10").load()

  test("unfiltered batch read plans one partition per page") {
    val df = pages(5)
    assert(df.count() == 50)
    assert(df.rdd.getNumPartitions == 5)
  }

  test("a page predicate prunes partitions at the source") {
    val df = pages(5).filter(col("page") === 2)
    assert(df.rdd.getNumPartitions == 1) // 4 pages never planned/fetched
    assert(df.count() == 10)
    assert(df.select("page").distinct().collect().map(_.getLong(0)).toSeq == Seq(2L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[EqualTo(page,2)]"), plan)
  }

  test("range predicates prune and residuals still apply") {
    val df = pages(6).filter(col("page") >= 2 && col("page") < 5 &&
      col("book_type") === "Hardcover")
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("page") >= 2 && r.getAs[Long]("page") < 5))
    assert(rows.forall(_.getAs[String]("book_type") == "Hardcover"))
  }

  test("column pruning reaches the reader schema") {
    val df = pages(3).select("title", "price")
    assert(df.schema.fieldNames.toSeq == Seq("title", "price"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=[title, price]"), plan)
    assert(df.count() == 30)
  }
}
