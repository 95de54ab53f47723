package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF: weighted average in fixed-point arithmetic.
  *
  * This is the engine's first-class form of the reference's UDAF-shaped
  * `groupby('Author').apply(lambda x: (x['Rating']*x['Rating_count']).sum())`
  * (`/root/reference/dags/dag.py:167-174`) — the one aggregate pandas
  * could not express as a built-in. Spark-side it's an
  * `Aggregator[IN,BUF,OUT]` registered through `functions.udaf`, so it
  * gets partial (map-side) aggregation and shuffle-merge like any
  * built-in: `reduce` runs per partition, `merge` combines partial
  * buffers — at 100 TB only one (Σv·w, Σw) pair per group crosses the
  * network, never the rows.
  *
  * Values are integral fixed-point (e.g. cents with `valueScale=100`):
  * the buffer is exact, so the result is independent of partitioning
  * and row order, and `finish` applies HALF_UP rounding to 4 decimals
  * in pure integer arithmetic (matches `Enrich.roundDiv4Sql` on the
  * DuckDB oracle side). Long arithmetic bounds: 2·Σ(v·w)·10⁴ must fit
  * in 63 bits — Σ(v·w) < 4.6e14 per group; beyond that, switch the
  * buffer to BigInt or pre-aggregate.
  *
  * @param valueScale fixed-point denominator of the value input
  *                   (100 ⇒ input is in hundredths)
  */
final class WeightedAvgFixed(valueScale: Long)
    extends Aggregator[(Long, Long), (Long, Long), Double] with Serializable {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)

  /** round(Σv·w / (Σw·scale), 4) HALF_UP, exactly. */
  override def finish(b: (Long, Long)): Double = {
    if (b._2 == 0L) return 0.0
    val n = b._1
    val d = b._2 * valueScale
    val q = (2L * n * 10000L + d) / (2L * d)
    q.toDouble / 10000.0
  }

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
