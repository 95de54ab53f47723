package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, Enrich, Standardise}

/** Property-based checks (SURVEY §5 strategy item 2): algebraic laws
  * the operators must satisfy on arbitrary inputs, not just fixtures.
  * (No scalatestplus bridge in the offline cache, so properties sample
  * ScalaCheck generators from a FIXED seed — deterministic cases,
  * same laws.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("roundDiv4 equals BigDecimal HALF_UP for arbitrary n/d") {
    val cases = samples(Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 9999L)), 60)
    val df = cases.toDF("n", "d")
    val got = df.select(col("n"), col("d"),
      Enrich.roundDiv4(col("n"), col("d")).as("q")).collect()
    got.foreach { r =>
      val (n, d) = (r.getLong(0), r.getLong(1))
      val want = BigDecimal(n).bigDecimal
        .divide(BigDecimal(d).bigDecimal, 4, java.math.RoundingMode.HALF_UP)
        .doubleValue()
      assert(r.getDouble(2) == want, s"n=$n d=$d")
    }
  }

  test("weighted mean lies within [min, max] of the values") {
    val listGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0, 50).map(_ / 10.0), Gen.chooseNum(1, 1000)))
    samples(listGen, 12).foreach { vs =>
      val df = vs.toDF("rating", "rating_count")
        .withColumn("author", lit("x")).withColumn("price", lit(1.0))
      val avg = Enrich.metrics(df, Seq(col("author")),
        col("rating"), 1, col("rating_count"), col("price"))
        .head().getAs[Double]("average_rating")
      val lo = vs.map(_._1).min
      val hi = vs.map(_._1).max
      assert(avg >= lo - 0.0001 && avg <= hi + 0.0001, s"$avg not in [$lo,$hi]")
    }
  }

  test("sorted_intersect_size agrees with Scala Set intersection on arbitrary sets") {
    val setGen = Gen.zip(
      Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct.sorted),
      Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct.sorted))
    samples(setGen, 30).foreach { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.GraftFunctions
          .sortedIntersectSize(spark, col("a"), col("b")))
        .head().getInt(0)
      assert(got == a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("media codec round-trips arbitrary dimensions; frame sampling is a slice of decode") {
    import graft.operators.Multimodal
    val codec = new Multimodal.MediaCodec
    val dimGen = Gen.zip(Gen.chooseNum(1, 21), Gen.chooseNum(1, 11),
      Gen.chooseNum(1, 7), Gen.chooseNum(0L, 999L))
    samples(dimGen, 25).foreach { case (w, h, fr, id) =>
      // BMP: arbitrary (w, h) exercises every stride/padding residue
      val bmp = Multimodal.Asset(id, "image", Multimodal.MediaFixtures.encodeBmp(w, h, id))
      val bd = codec.decode(bmp)
      assert((bd.width, bd.height) == (w, h), s"bmp $w x $h id=$id")
      assert(codec.features(bmp).n_values == w * h * 3)
      // WAV: n samples round-trip
      val wav = Multimodal.Asset(id, "audio",
        Multimodal.MediaFixtures.encodeWav(w * h, 8000, id))
      assert(codec.decode(wav).n_frames == w * h)
      // Y4M: frame sampling at ANY stride is exactly the stride-1
      // decode restricted to sampled ids — no re-parse drift
      val y4m = Multimodal.Asset(id, "video",
        Multimodal.MediaFixtures.encodeY4m(w, h, fr, id))
      assert(codec.decode(y4m).n_frames == fr)
      val all = codec.sampleFrames(y4m, 1)
      assert(all.map(_.frame_id) == (0 until fr))
      val full = codec.features(y4m)
      assert(all.map(_.v_sum).sum == full.v_sum && all.map(_.n_high).sum == full.n_high
        && all.map(_.v_max).max == full.v_max && all.map(_.n_values).sum == full.n_values,
        s"frame stats don't tile the asset stats: $w x $h x $fr id=$id")
      val stride = 1 + (id % 3).toInt
      val sampled = codec.sampleFrames(y4m, stride)
      assert(sampled == (0 until fr by stride).map(all(_)),
        s"stride-$stride sample isn't a slice of stride-1")
    }
  }

  test("connectedComponents: same component iff connected (vs Scala union-find)") {
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 12L))).map(
      _.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)
    samples(edgeGen, 6).filter(_.nonEmpty).foreach { edges =>
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: plain union-find on the driver
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      assert(got.keySet == nodes.toSet)
      nodes.foreach { n =>
        // cluster label = min node of the component
        val members = nodes.filter(m => find(m) == find(n))
        assert(got(n) == members.min, s"node $n in $edges")
      }
    }
  }

  test("pack/merge invariants: packing conserves tokens; upsert is idempotent on keys") {
    // packing: sum of bin token counts equals sum of doc token counts
    val docs = samples(Gen.nonEmptyListOf(Gen.chooseNum(1, 500)), 6)
    docs.foreach { toks =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "n_tokens")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val packed = df
        .withColumn("before", coalesce(sum(col("n_tokens")).over(w), lit(0)))
        .withColumn("bin", floor(col("before") / 256))
        .groupBy(col("bin")).agg(sum(col("n_tokens")).as("bin_tokens"))
      val total = packed.agg(sum(col("bin_tokens"))).head().getLong(0)
      assert(total == toks.map(_.toLong).sum)
    }
  }

  test("morton2 is a bijection on 16-bit pairs and preserves per-axis order") {
    val pairGen = Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))
    val cases = samples(pairGen, 80).distinct
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.queries.ScaleQueries.morton2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      // reference deinterleave: z's even bits → x, odd bits → y
      var (dx, dy, i) = (0L, 0L, 0)
      while (i < 16) {
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      assert((dx, dy) === ((x, y)), s"morton2($x,$y)=$z roundtrip ($dx,$dy)")
    }
    // monotone in each axis with the other held fixed (what makes
    // z-ranges contiguous per quad-tree cell)
    val byY = got.groupBy(_._2)
    byY.values.foreach { g =>
      val s = g.sortBy(_._1)
      assert(s.map(_._3) === s.map(_._3).sorted, "not monotone in x")
    }
  }

  test("sample_bottomk is mergeable: bottom-k of shards merges to the global sample") {
    // the docstring's O(k)-mergeable-state claim, checked directly:
    // bottom-k(corpus) == bottom-k(merge of per-shard bottom-ks)
    import graft.operators.TextOps
    val hv = TextOps.h60(concat(lit("bk_"), col("doc_id").cast("string")))
    val hashed = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), hv.as("hv"))
    val global = graft.queries.PipelineQueries.sampleBottomK(spark, sf)
      .collect().map(r => (r.getLong(4), r.getLong(1))) // (hv, doc_id)
    val merged = (0 until 3).flatMap { shard =>
      hashed.filter(col("doc_id") % 3 === shard)
        .orderBy(col("hv"), col("doc_id")).limit(100)
        .collect().map(r => (r.getLong(1), r.getLong(0))) // (hv, doc_id)
    }.sorted.take(100)
    assert(global.toSeq == merged, "shard-merged bottom-k diverges from global")
  }

  test("dedupFirst is idempotent, keys unique, first-wins by order column") {
    val listGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0, 100)))
    samples(listGen, 12).foreach { vs =>
      val df = vs.toDF("k", "v")
      val once = Standardise.dedupFirst(df, Seq(col("k")), Seq(col("v")))
      val twice = Standardise.dedupFirst(once, Seq(col("k")), Seq(col("v")))
      val got = once.collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
      assert(got == twice.collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq)
      assert(got.map(_._1).distinct.size == got.size)
      // first-wins: each key keeps its minimal v (v is the only order col)
      val want = vs.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).min) }
        .toSeq.sorted
      assert(got == want)
    }
  }

  test("drift count merge is commutative, associative, equals one-shot counts") {
    // the law the streaming drift monitor's exactly-once story rests
    // on: slicing the corpus ARBITRARILY and merging slice counts in
    // ANY grouping/order equals counting the whole corpus once. (The
    // snapshot protocol serializes the merges; this pins that the
    // ALGEBRA never depended on that order.)
    import graft.operators.Drift
    val docGen = Gen.zip(Gen.oneOf("s1", "s2", "s3"),
      Gen.nonEmptyListOf(Gen.oneOf("w1", "w2", "w3", "w4", "w5"))
        .map(_.mkString(" ")))
    def collectCounts(cf: org.apache.spark.sql.DataFrame) =
      cf.collect().map(r => (r.getString(0), r.getString(1),
        r.getDecimal(2).longValueExact())).sorted.toSeq
    samples(Gen.nonEmptyListOf(docGen), 8).foreach { docs =>
      val df = docs.toDF("source", "text")
      val whole = collectCounts(Drift.docCounts(df))
      val n = docs.length
      val (a, bc) = docs.splitAt(n / 3)
      val (b, c) = bc.splitAt(bc.length / 2)
      def cdf(s: Seq[(String, String)]) =
        Drift.docCounts(s.toDF("source", "text"))
      if (a.nonEmpty && b.nonEmpty && c.nonEmpty) {
        val leftAssoc = collectCounts(
          Drift.mergeCounts(Drift.mergeCounts(cdf(a), cdf(b)), cdf(c)))
        val rightAssoc = collectCounts(
          Drift.mergeCounts(cdf(a), Drift.mergeCounts(cdf(b), cdf(c))))
        val commuted = collectCounts(
          Drift.mergeCounts(Drift.mergeCounts(cdf(c), cdf(a)), cdf(b)))
        assert(leftAssoc == whole && rightAssoc == whole && commuted == whole)
      }
    }
  }

  test("drift count overflow fails loudly instead of nulling state") {
    // with ANSI off, a bare down-cast of an overflowing sum yields
    // NULL — silent streaming-state corruption. mergeCounts must
    // instead raise. Below the ceiling the merge is exact.
    import graft.operators.Drift
    def cell(v: String) = spark.sql(
      s"SELECT 's1' AS source, 'w1' AS word, CAST($v AS DECIMAL(18,0)) AS cnt")
    val ok = Drift.mergeCounts(cell("4e17"), cell("4e17")).collect()
    assert(ok.head.getDecimal(2).longValueExact() == 800000000000000000L)
    val boom = intercept[Exception] {
      Drift.mergeCounts(cell("6e17"), cell("6e17")).collect()
    }
    val messages = Iterator.iterate[Throwable](boom)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("overflow"),
      s"expected loud overflow, got: $messages")
  }
}
