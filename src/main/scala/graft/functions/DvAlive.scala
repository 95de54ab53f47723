package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.DvBlobs

/** Native deletion-vector mask predicate: is row (`file`, `pos`) of
  * the DV table at `root` still alive (NOT tombstoned)?
  *
  * This is the read-side filter of [[graft.operators.DeletionVectors]]
  * — applied directly over the scan's own metadata columns
  * (`_metadata.file_path`, `_metadata.row_index`), it replaces the
  * round-9 broadcast anti-join against the whole tombstone sidecar.
  * The generated code stays inside whole-stage codegen (the scan,
  * this filter, and downstream operators fuse into one loop) and
  * probes [[DvBlobs]]' per-file merged vector: O(that file's
  * tombstones) loaded per task, a binary search per row, nothing
  * global, nothing broadcast — masked-read cost tracks the PROBED
  * files' tombstones regardless of total sidecar volume.
  *
  * `root` (the table root) and `epoch` are plan-time constants,
  * carried as referenced objects, not per-row children. The epoch —
  * a fresh token per mask construction — invalidates the executor
  * threads' current-file memo between queries: tombstones are
  * global-and-current, so each NEW masked read must re-resolve each
  * file's delta set even on a thread that cached it for an earlier
  * query (a masked DataFrame re-executed after later deletes may
  * still serve its construction-time mask per thread — construct a
  * fresh read for fresh state, the documented contract).
  */
case class DvAlive(file: Expression, pos: Expression, root: String,
    epoch: String) extends BinaryExpression {

  override def left: Expression = file
  override def right: Expression = pos

  override def checkInputDataTypes(): TypeCheckResult =
    (file.dataType, pos.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, bigint), got $l / $r")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "dv_alive"

  override protected def nullSafeEval(f: Any, p: Any): Any =
    !DvBlobs.contains(root, epoch, f.asInstanceOf[UTF8String],
      p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, p) => {
      val rootRef = ctx.addReferenceObj("dvRoot", root, "java.lang.String")
      val epochRef = ctx.addReferenceObj("dvEpoch", epoch, "java.lang.String")
      s"${ev.value} = !graft.operators.DvBlobs.contains(" +
        s"$rootRef, $epochRef, $f, $p);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(file = newLeft, pos = newRight)
}
