package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.queries.TextQueries
import graft.sources.Tables

/** Unigram-LM tokenizer training: the engine's unrolled Viterbi hard-EM
  * must match an independent in-JVM reference implementation of the
  * same algorithm, exhibit the EM behavior that distinguishes unigram
  * training from frequency ranking, and stay partitioning-independent.
  */
class UnigramSpec extends SparkSpec {

  private val W = TextQueries.UNI_W
  private val P = TextQueries.UNI_P
  private val K = TextQueries.UNI_K

  private def q(d: Double): BigDecimal =
    BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  private def score(w: Map[String, Long]): Map[String, BigDecimal] = {
    val tot = w.values.sum.toDouble
    w.map { case (t, c) => t -> q(math.log(c.toDouble / tot)) }
  }

  /** The reference Viterbi, shared by the train and encode checks:
    * same tie-break (larger j first = shorter final piece wins).
    */
  private def viterbi(w: String, s: Map[String, BigDecimal]): Seq[String] = {
    val NEG = BigDecimal("-999999")
    val dp = Array.fill(w.length + 1)(BigDecimal(0))
    val bp = Array.fill(w.length + 1)(0)
    for (i <- 1 to w.length) {
      // larger j first; maxBy keeps the FIRST max
      val cands = (math.max(0, i - P) until i).reverse.map { j =>
        (j, dp(j) + s.getOrElse(w.substring(j, i), NEG))
      }
      val (bj, bv) = cands.maxBy(_._2)
      dp(i) = bv; bp(i) = bj
    }
    var pos = w.length
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) { out.prepend(w.substring(bp(pos), pos)); pos = bp(pos) }
    out.toSeq
  }

  /** Independent reference: plain-Scala Viterbi hard-EM with the same
    * seeding, quantization, tie-break and pruning rules.
    */
  private def referenceTrain(words: Map[String, Long])
      : Map[String, Long] = {
    val seed: Map[String, Long] = words.toSeq
      .flatMap { case (w, f) =>
        for {
          l <- 1 to P
          st <- 0 to w.length - l
        } yield (w.substring(st, st + l), f)
      }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val chars = words.keys.flatMap(_.toSeq).map(_.toString).toSet

    var weights = seed
    for (_ <- 1 to K) {
      val s = score(weights)
      val counts = words.toSeq
        .flatMap { case (w, f) => viterbi(w, s).map(_ -> f) }
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      weights = counts.filter { case (t, c) => t.length >= 2 && c > 0 } ++
        chars.map(c => c -> (counts.getOrElse(c, 0L) + 1L))
    }
    weights
  }

  test("engine EM result equals the independent in-JVM reference trainer") {
    val words = Tables.documents(spark, sf)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .filter(length(col("w")).between(1, W))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceTrain(words)
    val wantTop = want.toSeq
      .sortBy { case (t, c) => (-c, -t.length, t) }
      .take(TextQueries.UNI_OUT)
    val got = TextQueries.unigramTrain(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(got.toSeq == wantTop.map { case (t, c) => (t, c) },
      s"engine top-${TextQueries.UNI_OUT} diverged from the reference:\n" +
        s"got  ${got.toSeq}\nwant $wantTop")
  }

  test("EM moves mass onto multi-char pieces: some piece beats the seed ranking") {
    val out = TextQueries.unigramTrain(spark, sf).collect()
    assert(out.length == TextQueries.UNI_OUT)
    val multi = out.filter(_.getInt(2) >= 2)
    assert(multi.nonEmpty,
      "no multi-char piece survived EM — hard-EM degenerated to chars")
    // counts are Viterbi USAGE counts: bounded by corpus word count,
    // whereas seed substring counts over-count every occurrence; the
    // distinction is what the E-step exists to compute
    val corpusWords = Tables.documents(spark, sf)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .filter(length(col("w")).between(1, W)).count()
    val maxPieces = corpusWords * W
    assert(out.forall(_.getLong(3) <= maxPieces))
  }

  test("result is partitioning-independent") {
    val a = TextQueries.unigramTrain(spark, sf).collect().toSeq
    val re = spark.newSession()
    re.conf.set("spark.sql.shuffle.partitions", "7")
    val b = TextQueries.unigramTrain(re, sf).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  /** Reference ENCODE on top of [[referenceTrain]]: segment every doc
    * word under the final trained scores with the same viterbi, build
    * the same per-doc aggregate incl. the md5 fingerprint — the full
    * output cross-checked row by row.
    */
  test("encode equals an independent in-JVM reference end to end") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
    val words = docs.flatMap(_._2.split(" ", -1))
      .filter(w => w.length >= 1 && w.length <= W)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val s = score(referenceTrain(words))
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val want = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      if (ws.isEmpty) None
      else {
        val segs = ws.map { w =>
          if (w.length > W) (w, 1L, 1L)
          else {
            val ps = viterbi(w, s)
            (ps.mkString(","), ps.size.toLong, 0L)
          }
        }
        Some((id, ws.length.toLong, segs.map(_._3).sum,
          segs.map(_._2).sum, md5hex(segs.map(_._1).mkString("|"))))
      }
    }

    val got = TextQueries.unigramTokens(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.size == want.size,
      s"row count: got ${got.size}, want ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"encode diverged for doc ${w._1}:\n got $g\nwant $w")
    }
  }

  test("encode respects the segmentation bounds per document") {
    // every word yields ≥ ceil(len/P) and ≤ len pieces (OOV words
    // yield exactly 1): check the aggregate bounds independently
    val bounds = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(TextOps.words(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nw"),
        sum(when(length(col("w")) > W, lit(1L))
          .otherwise(ceil(length(col("w")) / lit(P.toDouble))))
          .as("lo"),
        sum(when(length(col("w")) > W, lit(1L))
          .otherwise(length(col("w")).cast("long"))).as("hi"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val out = TextQueries.unigramTokens(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nw, lo, hi) = bounds(r.getLong(0))
      assert(r.getLong(1) == nw)
      assert(r.getLong(3) >= lo && r.getLong(3) <= hi,
        s"doc ${r.getLong(0)}: n_pieces ${r.getLong(3)} outside [$lo,$hi]")
    }
  }
}
