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

  /** Independent reference: plain-Scala Viterbi hard-EM with the same
    * seeding, quantization, tie-break and pruning rules.
    */
  private def referenceTrain(words: Map[String, Long])
      : Map[String, Long] = {
    def q(d: Double): BigDecimal =
      BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def score(w: Map[String, Long]): Map[String, BigDecimal] = {
      val tot = w.values.sum.toDouble
      w.map { case (t, c) => t -> q(math.log(c.toDouble / tot)) }
    }
    val seed: Map[String, Long] = words.toSeq
      .flatMap { case (w, f) =>
        for {
          l <- 1 to P
          st <- 0 to w.length - l
        } yield (w.substring(st, st + l), f)
      }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val chars = words.keys.flatMap(_.toSeq).map(_.toString).toSet

    def viterbi(w: String, s: Map[String, BigDecimal]): Seq[String] = {
      val NEG = BigDecimal("-999999")
      val dp = Array.fill(w.length + 1)(BigDecimal(0))
      val bp = Array.fill(w.length + 1)(0)
      for (i <- 1 to w.length) {
        // larger j first; strict > keeps the first (largest-j) winner
        val cands = (math.max(0, i - P) until i).reverse.map { j =>
          (j, dp(j) + s.getOrElse(w.substring(j, i), NEG))
        }
        val (bj, bv) = cands.maxBy(_._2) // maxBy keeps the FIRST max
        dp(i) = bv; bp(i) = bj
      }
      var pos = w.length
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (pos > 0) { out.prepend(w.substring(bp(pos), pos)); pos = bp(pos) }
      out.toSeq
    }

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
}
