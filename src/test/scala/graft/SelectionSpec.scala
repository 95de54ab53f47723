package graft

import org.apache.spark.sql.functions._
import graft.operators.Selection

/** Golden/property tests for the DSIR selection operator — behavior the
  * oracle gate exercises only at corpus scale.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha alpha alpha", true), // defines the target distribution
    (2L, "alpha beta", false),
    (3L, "beta beta gamma", false),
  ).toDF("doc_id", "text", "tgt")

  private def weights = Selection
    .dsirLogWeights(docs, col("doc_id"), col("text"), col("tgt"), nBuckets = 1024)
    .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap

  test("target-like documents get higher importance weights") {
    val w = weights
    // the pure-target doc outranks everything; the raw doc sharing a
    // target word outranks the raw doc sharing none
    assert(w(1L) > w(2L), s"target doc not on top: $w")
    assert(w(2L) > w(3L), s"'alpha beta' should beat 'beta beta gamma': $w")
  }

  test("weights are exact decimals — identical under repartitioning") {
    val a = weights
    val b = Selection.dsirLogWeights(docs.repartition(7),
        col("doc_id"), col("text"), col("tgt"), nBuckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(a == b) // bitwise, not approx — the exact-decimal contract
  }
}
