package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.Asset
import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

/** The stub codec's contract: deterministic, byte-exact, and the batch
  * shape of the mapPartitions pipeline.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val codec = new Multimodal.FakeCodec

  test("decode is deterministic and md5-derived") {
    val a = Asset(7L, "image", "hello world".getBytes("UTF-8"))
    val d1 = codec.decode(a)
    val d2 = codec.decode(a)
    assert(d1 == d2)
    assert(d1.checksum == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(d1.n_bytes == 11)
    assert(d1.width >= 16 && d1.width < 16 + 1024)
  }

  test("feature histogram buckets cover every byte exactly once") {
    val payload = "abc xyz 019 !?".getBytes("UTF-8")
    val f = codec.features(Asset(1L, "audio", payload))
    val total = f.f0 + f.f1 + f.f2 + f.f3 + f.f4 + f.f5 + f.f6 + f.f7
    assert(total == payload.length)
    assert(f.f0 == 3) // a,b,c
    assert(f.f4 == 3) // x,y,z
    assert(f.f5 == 3) // spaces
    assert(f.f6 == 3) // 0,1,9
    assert(f.f7 == 2) // !,?
  }

  test("mapPartitions pipeline: one codec per partition, all rows processed") {
    val ds = spark.range(100)
      .map(i => Asset(i, "image", s"payload $i".getBytes("UTF-8")))
      .repartition(5)
    val out = ds.mapPartitions { it =>
      val c = new Multimodal.FakeCodec
      it.map(c.decode)
    }
    assert(out.count() == 100)
    assert(out.map(_.asset_id).collect().sorted.toSeq == (0L until 100L))
  }

  test("fused cosine of concatenated unit halves = mean of per-modality cosines") {
    // The identity multimodal_fusion_dedup relies on: with both halves
    // unit-normalized, |concat|² = 2 on each side, so
    // cos(concat(a,b), concat(c,d)) = (dot(a,c) + dot(b,d)) / 2.
    val df = spark.range(1).select(
      typedLit(Seq(3.0, 4.0)).as("ta"), typedLit(Seq(0.0, 1.0)).as("tb"),
      typedLit(Seq(1.0, 2.0, 2.0)).as("ia"), typedLit(Seq(2.0, -1.0, 2.0)).as("ib"))
    def norm(c: org.apache.spark.sql.Column) = {
      val n = sqrt(graft.operators.Dedup.dot(c, c))
      transform(c, x => x / n)
    }
    val fusedCos = graft.functions.GraftFunctions.cosineSim(spark,
      concat(norm(col("ta")), norm(col("ia"))),
      concat(norm(col("tb")), norm(col("ib"))))
    val halves = (graft.functions.GraftFunctions.cosineSim(spark, col("ta"), col("tb"))
      + graft.functions.GraftFunctions.cosineSim(spark, col("ia"), col("ib"))) / 2
    val Array(f, h) = df.select(fusedCos, halves).head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(f - h) < 1e-12, s"fused $f vs mean-of-halves $h")
  }

  test("caption retrieval: k ranked image hits per caption, no cartesian plan") {
    val out = MultimodalQueries.captionTopk(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "caption top-k must not plan a cartesian")
    val rows = out.collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.keySet == (0L until 5L).toSet)
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq.sorted == (1 to 10), s"caption $q ranks")
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        s"caption $q cosine not non-increasing")
    }
  }

  test("fusion dedup: unique removals, cluster ids from the trained codebook") {
    val rows = MultimodalQueries.fusionDedup(spark, sf).collect()
    assert(rows.nonEmpty, "synthetic corpus should contain fused near-dups")
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "a vector is removed at most once")
    assert(rows.forall(_.getLong(0) < 8L), "c_id stays in the 8-centroid seed space")
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    assert(ids.length < total, "dedup must not remove the whole corpus")
  }
}
