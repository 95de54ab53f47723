package graft

import org.apache.spark.sql.{Encoders, functions => F}
import graft.functions.WeightedAvgFixed

class WeightedAvgSpec extends SparkSpec {
  import spark.implicits._

  private val wavg = F.udaf(new WeightedAvgFixed(100L),
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))

  test("weighted average on cents inputs") {
    // values 10.00(w1), 20.00(w3) → (1000 + 3·2000)/(4·100) = 17.50
    val df = Seq((1000L, 1L), (2000L, 3L)).toDF("cents", "w")
    val v = df.agg(wavg(F.col("cents"), F.col("w"))).head().getDouble(0)
    assert(v == 17.5)
  }

  test("merge across partitions gives identical result") {
    val df = spark.range(10000).select(
      (F.col("id") % 997).as("cents"), (F.col("id") % 7 + 1).as("w"))
    val one = df.coalesce(1).agg(wavg(F.col("cents"), F.col("w"))).head().getDouble(0)
    val many = df.repartition(16).agg(wavg(F.col("cents"), F.col("w"))).head().getDouble(0)
    assert(one == many)
  }

  test("empty group yields 0.0") {
    val df = Seq.empty[(Long, Long)].toDF("cents", "w")
    assert(df.agg(wavg(F.col("cents"), F.col("w"))).head().getDouble(0) == 0.0)
  }
}
