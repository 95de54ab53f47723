package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now today"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
  ).toDF("doc_id", "text")

  test("shingles3: sizes and short-document guard") {
    val sh = docs.select(TextOps.shingles3(spark, TextOps.words(col("text"))).as("s"))
      .select(size(col("s"))).as[Int].collect()
    assert(sh(0) == 7) // 9 words → 7 shingles, all distinct
    val short = Seq("one two", "one", "").toDF("text")
      .select(size(TextOps.shingles3(spark, TextOps.words(col("text"))))).as[Int].collect()
    assert(short.toSeq == Seq(0, 0, 0))
  }

  test("identical docs have identical minhash signatures; near-dups mostly agree") {
    val sz = Dedup.shingled(docs, col("doc_id"), col("text"))
      .withColumn("hs", transform(col("sh"), s => TextOps.h60(s)))
    val sigs = sz.select(col("id"), Dedup.signature(col("hs"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L)) // exact dup → equal signature
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree12 > agree13) // signature agreement tracks jaccard
  }

  test("jaccard intersection arithmetic") {
    val a = Seq((Seq("x", "y", "z"), Seq("x", "y", "w"))).toDF("a", "b")
    assert(a.select(Dedup.interSize(col("a"), col("b"))).head().getInt(0) == 2)
  }

  test("sorted_intersect_size: two-pointer merge equals set intersection") {
    val rows = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L, 10L), 2), // {3,5}
      (Seq(1L, 2L), Seq(3L, 4L), 0),
      (Seq.empty[Long], Seq(1L), 0),
      (Seq(7L), Seq(7L), 1),
    ).toDF("a", "b", "want")
    val got = rows.select(
      graft.functions.GraftFunctions.sortedIntersectSize(spark, col("a"), col("b")).as("got"),
      col("want")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("connectedComponents: transitive chains merge, separate clusters stay apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: long chain converges within maxIter") {
    // path graph 0-1-2-...-9: worst-case diameter for min-propagation
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(0L))
  }

  test("connectedComponentsStar agrees with label propagation on every fixture") {
    val fixtures = Seq(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)), // two clusters, transitive chain
      (0L until 19L).map(i => (i, i + 1)), // 20-node path: diameter stress
      Seq((5L, 1L), (9L, 5L), (3L, 9L), (7L, 2L), (2L, 8L), (100L, 100L)), // shuffled ids + self loop
      Seq((4L, 4L)), // only a self loop: single node, own cluster
    )
    fixtures.foreach { f =>
      val pairs = f.toDF("id_a", "id_b")
      val lp = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponentsStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == lp, s"fixture $f: star=$star lp=$lp")
    }
  }

  test("semanticDedup golden: keeps the least-central member of each dup group") {
    // 2-dim fixture, nCent=2 (centroids = v0, v1), eps=0.9:
    //   cell0 = {v0=(1,0), v2=(.9,.1), v3=(.95,.05)}, cell1 = {v1=(0,1)}
    //   ccos: v0=1.0, v2=.9939, v3=.9986; all cell0 pairs ≥ .99
    // SemDeDup keeps the member FARTHEST from the centroid: v2 (lowest
    // ccos) survives; v0 and v3 are removed; v1 is alone and survives.
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.9, 0.1)), (3L, Seq(0.95, 0.05)),
    ).toDF("vec_id", "emb")
    val removed = Dedup.semanticDedup(spark, vecs, nCent = 2, eps = 0.9)
      .select(col("c_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert(removed == Set((0L, 0L), (0L, 3L)))
  }

  test("sequential dot product matches manual accumulation") {
    val v = Seq((Seq(0.1, 0.2, 0.3), Seq(0.4, 0.5, 0.6))).toDF("a", "b")
    val got = v.select(Dedup.dot(col("a"), col("b"))).head().getDouble(0)
    val want = ((0.0 + 0.1 * 0.4) + 0.2 * 0.5) + 0.3 * 0.6
    assert(got == want) // bitwise, not approx — the oracle contract
  }

  test("h60 is non-negative and h31 < 2^31-1") {
    val hs = docs.select(explode(TextOps.words(col("text"))).as("w"))
      .select(TextOps.h60(col("w")).as("h60"), TextOps.h31(col("w")).as("h31"))
      .collect()
    hs.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60))
      assert(r.getLong(1) >= 0L && r.getLong(1) < TextOps.P31)
    }
  }
}
