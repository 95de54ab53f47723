package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: subword tokenization of a word by
  * GREEDY LONGEST-MATCH against a vocabulary of multi-character
  * tokens (the BPE/WordPiece inference rule — Sennrich et al. 2016
  * learn the vocab by pair merges; at encode time both families scan
  * left-to-right taking the longest vocab token at each position,
  * falling back to a single character). Returns the token array, so
  * `concat(tokens) == word` ALWAYS holds (round-trip decode,
  * spec-pinned) and `size(tokens)` is the token count the pipeline
  * aggregates.
  *
  * Arguments: `(word: string, vocab: array<string>)`. The vocab is a
  * plain membership SET (order-irrelevant): at each position the
  * expression tries candidate lengths from [[BpeEncode.MaxTokenLen]]
  * down to 2 and takes the first vocab hit, else one character.
  * Determinism therefore depends only on the vocab CONTENTS, which
  * the `text_bpe_tokens` query derives deterministically (frequency
  * top-K with total ordering) — the DuckDB oracle replays the same
  * derivation and the same greedy scan.
  *
  * Why an expression and not a UDF/HOF: the scan is a per-row loop
  * over character positions × candidate lengths × a ≤64-entry vocab —
  * exactly the shape that must stay inside whole-stage codegen (the
  * [[WordNGrams]]/[[JaroWinkler]] static-kernel pattern). The vocab
  * arrives as an ordinary array column (broadcast-joined onto the
  * distinct-words table by the caller), so the same generated code
  * serves any vocab without re-compilation.
  *
  * Scale shape note for callers: encode DISTINCT words once and join
  * counts back (dictionary encoding) — the expression is cheap, but
  * at 100 TB there is no reason to re-encode every occurrence.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string>), got $l / $r")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(w: Any, v: Any): Any = {
    val word = w.asInstanceOf[UTF8String]
    val vocab = v.asInstanceOf[ArrayData]
    val n = word.numChars()
    val out = new java.util.ArrayList[AnyRef]()
    var pos = 0
    while (pos < n) {
      var take = 1
      var tok: UTF8String = null
      var len = math.min(BpeEncode.MaxTokenLen, n - pos)
      while (tok == null && len >= 2) {
        val cand = word.substring(pos, pos + len)
        var i = 0
        val m = vocab.numElements()
        while (tok == null && i < m) {
          if (!vocab.isNullAt(i) && cand.equals(vocab.getUTF8String(i))) {
            tok = cand
            take = len
          }
          i += 1
        }
        len -= 1
      }
      if (tok == null) tok = word.substring(pos, pos + 1)
      out.add(tok)
      pos += take
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, v) => {
      val utf8 = classOf[UTF8String].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val pos = ctx.freshName("pos")
      val take = ctx.freshName("take")
      val tok = ctx.freshName("tok")
      val len = ctx.freshName("len")
      val cand = ctx.freshName("cand")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |int $n = $w.numChars();
         |java.util.ArrayList<$utf8> $out = new java.util.ArrayList<$utf8>();
         |int $pos = 0;
         |while ($pos < $n) {
         |  int $take = 1;
         |  $utf8 $tok = null;
         |  for (int $len = Math.min(${BpeEncode.MaxTokenLen}, $n - $pos);
         |       $tok == null && $len >= 2; $len--) {
         |    $utf8 $cand = $w.substring($pos, $pos + $len);
         |    int $m = $v.numElements();
         |    for (int $i = 0; $tok == null && $i < $m; $i++) {
         |      if (!$v.isNullAt($i) && $cand.equals($v.getUTF8String($i))) {
         |        $tok = $cand;
         |        $take = $len;
         |      }
         |    }
         |  }
         |  if ($tok == null) $tok = $w.substring($pos, $pos + 1);
         |  $out.add($tok);
         |  $pos += $take;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $out.toArray());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {
  /** Longest learnable/matchable subword (vocab derivation and the
    * greedy scan must agree on this bound; the oracle SQL embeds it).
    */
  val MaxTokenLen = 6
}
