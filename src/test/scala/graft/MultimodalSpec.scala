package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.Asset

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
}
