package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV sketch state: the ≤ k smallest distinct hash values,
  * sorted ascending. A case class so the buffer rides the product
  * encoder (unsafe-row backed, no kryo).
  */
final case class KmvState(mins: Array[Long])

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the mergeable bounded-state shape every distributed sketch needs:
  * each partition keeps only the k smallest DISTINCT hash values
  * (O(k) memory regardless of input size), partial states merge by
  * sorted-merge + cap, and the estimate reads off the k-th minimum:
  * E = (k-1) / u_k with u_k the k-th smallest hash mapped into (0,1)
  * (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07).
  *
  * Unlike HLL (`approx_distinct`, rows-only check) the whole pipeline
  * is DETERMINISTIC — the same md5-prefix hash is computable in ANSI
  * SQL, so the DuckDB oracle reproduces the estimate bit-for-bit: an
  * approximate operator with an exact cross-engine correctness gate.
  *
  * Input is the 52-bit hash (first 13 md5 hex digits), precomputed as a
  * column so hashing stays in codegen; the aggregator handles only the
  * bounded-state selection.
  */
object KmvDistinct extends Aggregator[Long, KmvState, Double] {
  val K = 256

  def zero: KmvState = KmvState(Array.emptyLongArray)

  def reduce(b: KmvState, h: Long): KmvState = {
    val m = b.mins
    if (java.util.Arrays.binarySearch(m, h) >= 0) b
    else if (m.length < K || h < m(m.length - 1)) {
      val merged = (m :+ h).sorted
      KmvState(if (merged.length > K) merged.take(K) else merged)
    } else b
  }

  def merge(a: KmvState, b: KmvState): KmvState =
    KmvState((a.mins ++ b.mins).distinct.sorted.take(K))

  def finish(b: KmvState): Double =
    if (b.mins.length < K) b.mins.length.toDouble // fewer than k distinct: exact
    else {
      val uk = b.mins(K - 1).toDouble / 4503599627370496.0 // 2^52
      (K - 1).toDouble / uk
    }

  def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]

  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
