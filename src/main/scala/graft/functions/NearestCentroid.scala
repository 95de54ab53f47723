package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: argmax-cosine coarse-quantizer
  * assignment of an `array<double>` embedding against a CONSTANT
  * codebook, with whole-stage codegen. Returns
  * `struct(c_id: long, c_cos: double)` — the centroid of highest
  * cosine, ties to the lowest c_id (the repo-wide quantizer contract).
  *
  * Round-15 rationale: nearest-centroid assignment is the inner loop
  * of every trained-quantizer path (Lloyd iterations, SemDeDup cell
  * assignment, IVF inverted-list builds). The round-6 shape was a
  * corpus×codebook broadcast cross join + slim max_by aggregate + an
  * n-row join-back — one aggregate exchange and one join per
  * assignment. A first round-15 attempt composed the same thing from
  * ~NC built-in struct/array_max expressions, which Catalyst happily
  * DUPLICATES per consuming field (CollapseProject) and whose
  * generated code bloats past what whole-stage codegen keeps fused —
  * measured SLOWER than the aggregate it replaced. This expression is
  * the honest form: the codebook rides along as a reference object
  * (the way a production ANN build ships its codebook), the whole
  * argmax is one tight primitive loop in generated code, and the plan
  * is a bare Project — zero joins, zero aggregates, zero exchanges.
  *
  * Bit-exactness: the per-centroid cosine replicates
  * [[CosineSimilarity]]'s arithmetic VERBATIM — one fused
  * left-to-right pass accumulating dot/na/nb over
  * `min(|emb|, |centroid|)` elements, then `dot/(√na·√nb)` — so the
  * assignment (and the c_cos it reports) is bit-identical to the
  * former crossJoin-of-cosineSim forms and to the DuckDB oracles'
  * `list_dot_product` replay. The argmax comparator is
  * `java.lang.Double.compare` (NaN greatest, -0.0 < 0.0), the same
  * total order Spark's struct ordering gave the old
  * `max_by(struct(c_cos, -c_id))` pick.
  */
case class NearestCentroid(child: Expression, ids: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {
  require(ids.length == cents.length && ids.nonEmpty,
    "NearestCentroid needs a non-empty codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("c_id", LongType, nullable = false),
    StructField("c_cos", DoubleType, nullable = false)))

  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(e: Any): Any = {
    val x = e.asInstanceOf[ArrayData]
    var bestId = 0L
    var bestCos = 0.0
    var first = true
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      val n = math.min(x.numElements(), ce.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i)
        val yi = ce(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      val cmp = java.lang.Double.compare(cos, bestCos)
      if (first || cmp > 0 || (cmp == 0 && ids(c) < bestId)) {
        first = false; bestCos = cos; bestId = ids(c)
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestId, bestCos))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, emb => {
      val idsRef = ctx.addReferenceObj("ncIds", ids, "long[]")
      val centsRef = ctx.addReferenceObj("ncCents", cents, "double[][]")
      val bestId = ctx.freshName("bestId")
      val bestCos = ctx.freshName("bestCos")
      val first = ctx.freshName("first")
      val c = ctx.freshName("c")
      val ce = ctx.freshName("ce")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val cos = ctx.freshName("cos")
      val cmp = ctx.freshName("cmp")
      s"""
         |long $bestId = 0L; double $bestCos = 0.0; boolean $first = true;
         |for (int $c = 0; $c < $idsRef.length; $c++) {
         |  double[] $ce = $centsRef[$c];
         |  int $n = Math.min($emb.numElements(), $ce.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $emb.getDouble($i);
         |    double $yi = $ce[$i];
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $cos = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  int $cmp = java.lang.Double.compare($cos, $bestCos);
         |  if ($first || $cmp > 0 || ($cmp == 0 && $idsRef[$c] < $bestId)) {
         |    $first = false; $bestCos = $cos; $bestId = $idsRef[$c];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $bestId, $bestCos });
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}
