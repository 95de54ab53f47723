package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity kernel, shared by the interpreted and
  * codegen paths of [[JaroWinkler]] (the generated stage calls this
  * static method — same pattern Spark's own string expressions use for
  * non-trivial loops).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (probed
  * empirically, JaroWinklerSpec): standard Jaro with the
  * max(|a|,|b|)/2−1 match window and half-transposition count, Winkler
  * prefix boost (scale 0.1, prefix capped at 4) applied only when
  * jaro > 0.7 — DuckDB returns the unboosted value at 0.667 even with
  * a 4-char common prefix. Empty input or no matches ⇒ 0.
  *
  * The unit of comparison is the Unicode CODE POINT (a surrogate pair
  * counts as one character), not the UTF-16 code unit — so lengths,
  * match windows and prefix counts stay sane for astral-plane input.
  * The DuckDB pin itself is verified by the oracle gate and spec on
  * ASCII/BMP data only; non-BMP agreement depends on DuckDB also
  * counting code points.
  */
object JaroWinklerAlgo {
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    compute(a.toString, b.toString)

  def compute(sa: String, sb: String): Double = {
    if (sa.isEmpty || sb.isEmpty) return 0.0
    if (sa == sb) return 1.0
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native codegen'd Jaro-Winkler similarity of two string columns —
  * the entity-resolution scorer that (unlike `levenshtein`) rewards
  * shared prefixes, matching real-world name-variant behavior. The
  * loop lives in [[JaroWinklerAlgo]]; codegen emits a static call so
  * the expression stays inside the whole-stage-generated method with
  * no boxing (a Scala UDF would box both strings per row).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two string arguments, got $l / $r")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
