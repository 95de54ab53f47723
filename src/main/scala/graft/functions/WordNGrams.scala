package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: space-joined word n-grams of an
  * `array<string>` of tokens — `["a","b","c"], n=2` → `["a b","b c"]`;
  * fewer than n tokens → empty array.
  *
  * This is the tokenize→n-gram kernel of the text-analysis and dedup
  * operators (bigram vocabularies, duplicate-bigram repetition
  * signals, 3-shingle Jaccard sets). The built-in spelling —
  * `transform(sequence(0, size-n), i -> concat_ws(' ', ...))` — is a
  * higher-order function, which Spark always evaluates INTERPRETED:
  * per element it allocates an index array, evaluates a lambda via
  * reflection-style bound references, and re-boxes. Measured on the
  * 5 000-doc sf0.1 corpus that interpreted path dominated the cold run
  * of `text_ngram_vocab` (~92 s before JIT warms the interpreter;
  * 6.5 s warm). This expression emits a tight generated loop over the
  * packed `ArrayData` (no lambda, no boxing) and stays inside
  * whole-stage codegen, so the first run at 100 TB is as fast as the
  * hundredth.
  *
  * Semantics match the built-in spelling exactly: null tokens are
  * skipped by the join (UTF8String.concatWs ≡ concat_ws), and a
  * too-short input yields an EMPTY array — note the built-in needed an
  * explicit `when(size < n, ...)` guard because Spark's
  * `sequence(0, -1)` yields a descending range rather than an empty
  * one (reference semantics: word n-gram sets of short docs are
  * empty, `/root/reference/dags/dag.py:97` dedups whole titles — the
  * n-gram generalization is ours).
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val len = if (m < n) 0 else m - n + 1
    val out = new Array[AnyRef](len)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < len) {
      var k = 0
      while (k < n) {
        parts(k) = if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val m = ctx.freshName("m")
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val utf8 = classOf[UTF8String].getName
      // n is a compile-time constant: unroll the window into direct
      // concatWs arguments — no inner loop, no parts buffer
      def term(k: Int) =
        s"$a.isNullAt($i + $k) ? null : $a.getUTF8String($i + $k)"
      val args = (0 until n).map(k => s"(${term(k)})").mkString(", ")
      s"""
         |int $m = $a.numElements();
         |int $len = ($m < $n) ? 0 : ($m - $n + 1);
         |$utf8[] $out = new $utf8[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  $out[$i] = $utf8.concatWs($sepRef, $args);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
