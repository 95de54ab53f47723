package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (UDTF): one page-like string → N
  * (field, value) rows.
  *
  * This is the (c)-tier §2.8 extension: the reference's
  * `soup.find_all(...)` loop (`/root/reference/dags/dag.py:83-106`)
  * turns one fetched page into many book records; the Spark-native
  * shape for that is a Generator — the same operator class as
  * `explode`/`posexplode` — so the fan-out happens inside the plan
  * (GenerateExec), not in driver code.
  *
  * Record grammar (the offline stand-in for HTML): records separated
  * by `;`, fields by `,`, each field `key=value`. Tolerates empty
  * records/fields (skipped) — malformed input degrades to fewer rows,
  * never an error, matching the reference's skip-on-missing-field
  * behavior (`dag.py:94`).
  *
  * `CodegenFallback` is standard for generators (GenerateExec drives
  * eval row-at-a-time; the surrounding stage still codegens).
  */
case class ExtractItems(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("item_idx", org.apache.spark.sql.types.IntegerType, nullable = false),
    StructField("field", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  override def prettyName: String = "graft_extract_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_items expects a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val page = v.asInstanceOf[UTF8String].toString
    for {
      (record, idx) <- page.split(";").iterator.zipWithIndex
      if record.nonEmpty
      field <- record.split(",").iterator
      kv = field.split("=", 2)
      if kv.length == 2 && kv(0).nonEmpty
    } yield InternalRow(idx, UTF8String.fromString(kv(0)),
      UTF8String.fromString(kv(1)))
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractItems =
    copy(child = newChild)
}
