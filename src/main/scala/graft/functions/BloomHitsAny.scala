package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}

/** Shared bloom-filter arithmetic for the file-skipping index: the
  * build side ([[graft.operators.SkippingIndex.BloomBuildAgg]]) and
  * the probe side ([[BloomHitsAny]], including its GENERATED code)
  * must place bits identically, so the math lives here once and the
  * codegen template inlines the same constants (drift between the two
  * is pinned by SkippingIndexSpec's no-false-negative test, which runs
  * the real codegen path against aggregator-built filters).
  *
  * Double hashing (Kirsch–Mitzenmacher): two 64-bit hashes from
  * splitmix64, bit i at (h1 + i·h2) mod m — k independent-enough
  * probes from one hash computation, the standard public construction.
  */
object BloomMath {
  /** Number of probes per key; fixed so the sidecar stays
    * self-describing (m is carried by the filter's own length).
    */
  val K = 4

  def splitmix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def set(bits: Array[Byte], key: Long): Unit = {
    val m = bits.length.toLong * 8L
    val h1 = splitmix(key)
    val h2 = splitmix(h1) | 1L
    var i = 0
    while (i < K) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], key: Long): Boolean = {
    val m = bits.length.toLong * 8L
    val h1 = splitmix(key)
    val h2 = splitmix(h1) | 1L
    var i = 0
    while (i < K) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** Native codegen'd probe of the file-skipping sidecar: does this
  * bloom filter (binary column) claim to contain ANY of `keys`
  * (array<bigint>, a broadcast-small literal of probe keys)?
  *
  * This is the expression the index LOOKUP filters the sidecar with —
  * one codegen'd pass over (file, min, max, bloom) rows, no UDF
  * boxing, no driver collect of the sidecar. At 100 TB the sidecar is
  * itself a big table (millions of files × KB-scale filters), so the
  * probe must be a distributed scan-side filter, not driver logic.
  */
case class BloomHitsAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, array<bigint>), got $l / $r")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_hits_any"

  override protected def nullSafeEval(bloom: Any, keys: Any): Any = {
    val bits = bloom.asInstanceOf[Array[Byte]]
    val ks = keys.asInstanceOf[ArrayData]
    var i = 0
    val n = ks.numElements()
    while (i < n) {
      if (BloomMath.mightContain(bits, ks.getLong(i))) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, keys) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val z = ctx.freshName("z")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      val found = ctx.freshName("found")
      // splitmix64 + double hashing, the same arithmetic as
      // BloomMath.{set,mightContain} — keep the three in lockstep
      s"""
         |long $m = ((long) $bloom.length) * 8L;
         |int $n = $keys.numElements();
         |boolean $found = false;
         |for (int $i = 0; $i < $n && !$found; $i++) {
         |  long $z = $keys.getLong($i) + 0x9E3779B97F4A7C15L;
         |  $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |  $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |  long $h1 = $z ^ ($z >>> 31);
         |  $z = $h1 + 0x9E3779B97F4A7C15L;
         |  $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |  $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |  long $h2 = ($z ^ ($z >>> 31)) | 1L;
         |  boolean $hit = true;
         |  for (int $j = 0; $j < ${BloomMath.K} && $hit; $j++) {
         |    long $pos = java.lang.Long.remainderUnsigned($h1 + ((long) $j) * $h2, $m);
         |    if (($bloom[(int) ($pos >>> 3)] & (1 << (int) ($pos & 7L))) == 0) $hit = false;
         |  }
         |  if ($hit) $found = true;
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomHitsAny =
    copy(left = newLeft, right = newRight)
}
