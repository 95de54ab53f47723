package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.Asset
import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

/** The media codec's contract: REAL parsers of the public container
  * layouts, pinned against hand-assembled golden bytes (independent of
  * the fixture encoder), plus the batch shape of the mapPartitions
  * pipeline.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import java.nio.{ByteBuffer, ByteOrder}

  private val codec = new Multimodal.MediaCodec

  /** Hand-assembled 24-bit BMP straight from the published layout —
    * NOT via MediaFixtures, so encoder and parser can't share a bug.
    * `topDown=false` stores rows bottom-up (positive height), the
    * format's default; pixels are (y, x, B,G,R) triplets in TOP-DOWN
    * logical order either way.
    */
  private def goldenBmp(w: Int, h: Int, topDown: Boolean,
      px: Array[Byte]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val b = ByteBuffer.allocate(54 + stride * h).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    rows.foreach { y =>
      b.put(px, y * w * 3, w * 3)
      (w * 3 until stride).foreach(_ => b.put(0xEE.toByte)) // junk padding
    }
    b.array
  }

  test("BMP parser: header fields, bottom-up raster, padding excluded") {
    val px = Array.tabulate(12)(i => (i + 1).toByte) // 2x2, BGR triplets 1..12
    val d = codec.decode(Asset(1L, "image", goldenBmp(2, 2, topDown = false, px)))
    assert((d.container, d.width, d.height, d.n_frames, d.n_bytes) ==
      ("bmp", 2, 2, 1, 70))
    val f = codec.features(Asset(1L, "image", goldenBmp(2, 2, topDown = false, px)))
    // sum 1..12 = 78; the 0xEE junk padding bytes must NOT be counted
    assert((f.n_values, f.v_sum, f.v_max, f.n_high) == (12, 78L, 12, 0L))
    // negative height = top-down raster: same logical pixels, same stats
    val fTop = codec.features(Asset(1L, "image", goldenBmp(2, 2, topDown = true, px)))
    assert((fTop.n_values, fTop.v_sum, fTop.v_max) == (12, 78L, 12))
  }

  test("WAV parser: chunk walk past extra chunks, word-aligned, PCM16 LE") {
    val b = ByteBuffer.allocate(12 + (8 + 4) + (8 + 16) + (8 + 6))
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(4 + 12 + 24 + 14).put("WAVE".getBytes)
    b.put("LIST".getBytes).putInt(3) // odd-length chunk: walker must pad
      .put("abc".getBytes).put(0.toByte)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(6).putShort(100).putShort(-5).putShort(300)
    val d = codec.decode(Asset(2L, "audio", b.array))
    assert((d.container, d.n_frames, d.sample_rate) == ("wav", 3, 8000))
    val f = codec.features(Asset(2L, "audio", b.array))
    assert((f.n_values, f.v_sum, f.v_max, f.n_high) == (3, 395L, 300, 1L))
  }

  test("Y4M parser: ASCII header tags, FRAME markers, C444 planes") {
    val bytes = "YUV4MPEG2 W2 H1 F25:1 Ip A1:1 C444\n".getBytes ++
      "FRAME\n".getBytes ++ Array.tabulate(6)(i => (i + 1).toByte) ++
      "FRAME\n".getBytes ++ Array.tabulate(6)(i => (i + 7).toByte)
    val d = codec.decode(Asset(3L, "video", bytes))
    assert((d.container, d.width, d.height, d.n_frames) == ("y4m", 2, 1, 2))
    val f = codec.features(Asset(3L, "video", bytes))
    assert((f.n_values, f.v_sum, f.v_max) == (12, 78L, 12))
  }

  test("frame sampling: strided per-frame stats, non-video yields no rows") {
    // hand-assembled 2x1 C444 Y4M, 3 frames: frame f values = f*10 + (1..6)
    val bytes = "YUV4MPEG2 W2 H1 F25:1 Ip A1:1 C444\n".getBytes ++
      (0 until 3).flatMap(f =>
        "FRAME\n".getBytes.toSeq ++ Array.tabulate(6)(i => (f * 10 + i + 1).toByte)).toArray
    val fr = codec.sampleFrames(Asset(9L, "video", bytes), stride = 2)
    assert(fr.map(_.frame_id) == Seq(0, 2)) // frame 1 skipped by stride
    assert(fr.forall(_.n_values == 6))
    assert(fr.map(_.v_sum) == Seq(21L, 141L)) // Σ(1..6), Σ(21..26)
    assert(fr.map(_.v_max) == Seq(6, 26))
    assert(fr.map(_.n_high) == Seq(0L, 0L))
    // stills and audio sample no frames
    val bmp = Multimodal.MediaFixtures.encodeBmp(4, 2, 7L)
    assert(codec.sampleFrames(Asset(7L, "image", bmp), 2).isEmpty)
    val wav = Multimodal.MediaFixtures.encodeWav(16, 8000, 7L)
    assert(codec.sampleFrames(Asset(7L, "audio", wav), 2).isEmpty)
  }

  test("parser rejects unknown containers and unsupported variants") {
    intercept[IllegalArgumentException] {
      codec.decode(Asset(4L, "image", "not a container".getBytes))
    }
    // 8-bit BMP: recognized container, unsupported pixel format
    val bad = goldenBmp(2, 2, topDown = false, Array.fill(12)(1.toByte))
    bad(28) = 8 // bpp field
    intercept[IllegalArgumentException] {
      codec.decode(Asset(5L, "image", bad))
    }
  }

  test("fixture round-trip: encoder bytes parse back to the analytic stats") {
    // the same cross-check the DuckDB oracle performs, in-process
    for (id <- 0L to 8L) {
      val nChars = 48L + id * 37 % 200
      val a = Asset(id, Multimodal.MediaFixtures.kindOf(id),
        Multimodal.MediaFixtures.payloadFor(id, nChars))
      val d = codec.decode(a)
      val f = codec.features(a)
      assert(d.n_bytes == a.payload.length)
      val want: Seq[Long] = a.kind match {
        case "image" =>
          val (w, h) = ((16 + id % 13).toInt, (8 + nChars % 7).toInt)
          assert((d.width, d.height) == (w, h))
          for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
            yield (x * 7 + y * 13 + c * 31 + id) % 256
        case "audio" =>
          val n = (64 + nChars % 64).toInt
          assert((d.n_frames, d.sample_rate) == (n, 8000 + (id % 8) * 1000))
          for (t <- 0 until n) yield (t * 17 + id) % 256
        case _ =>
          val (w, h, fr) = ((8 + id % 6).toInt, (4 + nChars % 5).toInt, (2 + id % 3).toInt)
          assert((d.width, d.height, d.n_frames) == (w, h, fr))
          for (fi <- 0 until fr; p <- 0 until 3; y <- 0 until h; x <- 0 until w)
            yield (x * 3 + y * 5 + fi * 11 + p * 17 + id) % 256
      }
      assert(f.n_values == want.length, s"id=$id n_values")
      assert(f.v_sum == want.sum, s"id=$id v_sum")
      assert(f.v_max == want.max.toInt, s"id=$id v_max")
      assert(f.n_high == want.count(_ >= 128).toLong, s"id=$id n_high")
    }
  }

  test("mapPartitions pipeline: one codec per partition, all rows processed") {
    val ds = spark.range(100)
      .map(i => Asset(i, Multimodal.MediaFixtures.kindOf(i),
        Multimodal.MediaFixtures.payloadFor(i, 100 + i)))
      .repartition(5)
    val out = ds.mapPartitions { it =>
      val c = new Multimodal.MediaCodec
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
