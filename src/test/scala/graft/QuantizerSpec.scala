package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantizer

/** Unit behavior of the k-means quantizer trainer (the query-level
  * hash gate covers the full trained-assignment replay; these pin the
  * trainer's own contract on small engineered inputs).
  */
class QuantizerSpec extends AnyFunSuite with SparkSpec {

  private def vecs(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "emb")
  }

  test("two iterations move centroids off their seeds, one row per cell") {
    // 3 loose direction groups in 4-d; seeds 0 and 1 both sit in group A,
    // so training must pull them apart / toward member means
    val data = vecs(Seq(
      0L -> Seq(1.0, 0.1, 0.0, 0.0), 1L -> Seq(0.9, 0.2, 0.1, 0.0),
      2L -> Seq(0.0, 1.0, 0.1, 0.0), 3L -> Seq(0.1, 0.9, 0.0, 0.1),
      4L -> Seq(0.0, 0.1, 1.0, 0.2), 5L -> Seq(0.1, 0.0, 0.9, 0.1),
      6L -> Seq(0.95, 0.15, 0.05, 0.0), 7L -> Seq(0.05, 0.95, 0.05, 0.0)))
    val seeds = Map(
      0L -> Seq(1.0, 0.1, 0.0, 0.0), 1L -> Seq(0.9, 0.2, 0.1, 0.0))
    val got = Quantizer.trainedCentroids(spark, data, nCent = 2, iters = 2, dims = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.size == 2)
    got.values.foreach(c => assert(c.length == 4))
    // at least one centroid must have moved off its seed (members
    // average in); with two seeds inside one direction group, both do
    assert(got.count { case (id, c) => c != seeds(id) } >= 1)
    // determinism: same input, same result
    val again = Quantizer.trainedCentroids(spark, data, nCent = 2, iters = 2, dims = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == got)
  }

  test("a cell that loses all members keeps its previous centroid") {
    // all vectors identical: every assignment ties at cosine 1 and the
    // (cos DESC, c_id) tie-break sends ALL members to cell 0 — cell 1
    // is empty from iteration 1 and must keep its (seed) centroid
    val data = vecs((0L to 5L).map(i => i -> Seq(1.0, 0.0)))
    val got = Quantizer.trainedCentroids(spark, data, nCent = 2, iters = 2, dims = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.size == 2)
    // cell 0: quantized mean of all-identical vectors = the vector itself
    assert(got(0L) == Seq(1.0, 0.0))
    // cell 1: untouched seed (the COALESCE branch)
    assert(got(1L) == Seq(1.0, 0.0))
  }
}
