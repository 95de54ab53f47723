package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftPlanApi, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{DeletionVectors => DV}
import graft.sources.DvRelation

/** SQL DML on [[graft.operators.DeletionVectors]] tables:
  * `DELETE FROM` / `UPDATE` / `MERGE INTO` routed to the existing
  * merge-on-read machinery — the surface every real lakehouse user
  * touches first (Delta and Iceberg both ship DML before any Scala
  * API; the reference's own sinks are SQL statements,
  * ryantanzr/Orchestrated-ETL dags/dag.py:198-225).
  *
  * Spark parses the three statements into
  * [[DeleteFromTable]]/[[UpdateTable]]/[[MergeIntoTable]] and — for a
  * catalog table backed by a V1 relation like [[DvRelation]] — the
  * analyzer fully RESOLVES them (conditions, assignments, star-action
  * expansion) before checkAnalysis rejects the unsupported V1 target.
  * [[DvDmlRule]] therefore swaps the resolved node for a runnable
  * command in the resolution window; [[graft.GraftSql.sql]] drives the
  * same swap for sessions built without extensions (parse → analyze →
  * rule → execute). Nothing re-parses or re-resolves user
  * expressions: the commands carry the analyzer's RESOLVED trees and
  * re-anchor their exprIds onto the masked positional scan with the
  * same alias-projection discipline as [[DvScanRule]].
  *
  * Execution maps each statement onto the layer's primitives, so all
  * concurrency/fencing contracts hold unchanged:
  *  - DELETE → [[DV.markWhere]] (predicate mark, purge-fenced,
  *    O(deleted rows) sidecar bytes, zero data files touched);
  *  - UPDATE → new images computed from the pre-update masked state
  *    (checkpointed), then mark + one CAS-committed append — the
  *    merge-on-read upsert shape with a predicate instead of keys;
  *  - MERGE → one join of the positional scan against the
  *    checkpointed source, first-match action classification exactly
  *    once per row (the Delta WHEN-clause rule), multi-match failing
  *    loudly, then mark + append.
  */
object DvDml {

  /** Resolve a catalog identifier to a graft-dv table root (None for
    * temp views, missing tables, other providers, or non-session
    * catalogs) — the pre-resolution lookup time travel and the
    * maintenance statements share.
    */
  def dvCatalogRoot(session: SparkSession,
      ident: Seq[String]): Option[String] = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val cat = session.sessionState.catalog
    val tid = ident match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(c, db, t) if c.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    try {
      if (cat.isTempView(ident) || !cat.tableExists(tid)) None
      else {
        val m = cat.getTableMetadata(tid)
        if (m.provider.exists(_.equalsIgnoreCase("graft-dv")))
          m.storage.properties.get("path")
            .orElse(m.storage.locationUri.map(_.toString))
        else None
      }
    } catch { case _: Exception => None }
  }

  /** Unwrap alias wrappers down to a graft-dv [[LogicalRelation]]. */
  def dvTarget(plan: LogicalPlan): Option[(String, LogicalRelation)] =
    plan match {
      case SubqueryAlias(_, child) => dvTarget(child)
      case l: LogicalRelation => l.relation match {
        case d: DvRelation => Some((d.root, l))
        case _ => None
      }
      case _ => None
    }

  /** Project the masked positional scan so its table columns carry
    * `asOutput`'s exprIds (the [[DvScanRule]] alias discipline) —
    * every resolved condition/assignment the analyzer produced against
    * the catalog relation then evaluates against the live scan
    * unchanged. Returns (plan, file attr, pos attr); the positional
    * columns get fresh collision-proof names so a MERGE source may
    * itself carry `__file`/`__pos`.
    */
  private[plans] def rebound(scan: DataFrame,
      asOutput: Seq[Attribute]): (LogicalPlan, Attribute, Attribute) = {
    val p = GraftPlanApi.analyzed(scan)
    val byName = p.output.map(a => a.name -> a).toMap
    asOutput.foreach(o => require(byName.contains(o.name),
      s"DV scan is missing column ${o.name} the statement resolved " +
        "against — was the table re-created with a different schema?"))
    val fileAl = Alias(byName("__file"), "__graft_dml_file")()
    val posAl = Alias(byName("__pos"), "__graft_dml_pos")()
    val proj = Project(
      asOutput.map(o => Alias(byName(o.name), o.name)(exprId = o.exprId))
        ++ Seq(fileAl, posAl), p)
    (proj, fileAl.toAttribute, posAl.toAttribute)
  }

  private[plans] def assignMap(
      assignments: Seq[Assignment]): Map[ExprId, Expression] =
    assignments.map { a =>
      a.key match {
        case ar: Attribute => ar.exprId -> a.value
        case other => throw new UnsupportedOperationException(
          "graft-dv DML supports only top-level column assignments; " +
            s"got SET ${other.sql} = ...")
      }
    }.toMap

  /** One output image per target row: assigned columns take their
    * assignment value (cast to the column type — the analyzer does
    * not align V1 assignment types), the rest pass through (for
    * insert rows the pass-through target attrs are the outer join's
    * NULLs — exactly the unassigned-column NULL-fill rule).
    */
  private[plans] def imageCols(targetOutput: Seq[Attribute],
      sets: Map[ExprId, Expression]): Seq[Column] =
    targetOutput.map { o =>
      sets.get(o.exprId)
        .map(v => GraftPlanApi.column(v).cast(o.dataType))
        .getOrElse(GraftPlanApi.column(o))
        .as(o.name)
    }
}

/** Swap resolved DML nodes over graft-dv targets for runnable
  * commands. Installed by [[GraftPlans.install]]
  * (`injectResolutionRule`) for extension-built sessions, and applied
  * explicitly by [[graft.GraftSql.sql]] otherwise. Fires only on
  * fully-resolved statements, so error paths (bad columns, type
  * errors) still surface through the standard analyzer messages.
  */
object DvDmlRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable if d.resolved =>
      DvDml.dvTarget(d.table) match {
        case Some((root, rel)) =>
          DvDeleteCommand(root, rel.output, d.condition)
        case None => plan
      }
    case u: UpdateTable if u.resolved =>
      DvDml.dvTarget(u.table) match {
        case Some((root, rel)) =>
          DvUpdateCommand(root, rel.output, u.assignments, u.condition)
        case None => plan
      }
    case m: MergeIntoTable if m.resolved =>
      DvDml.dvTarget(m.targetTable) match {
        case Some((root, rel)) =>
          require(!m.withSchemaEvolution, "MERGE WITH SCHEMA EVOLUTION " +
            "is not supported on graft-dv tables")
          DvMergeCommand(root, rel.output, m.sourceTable,
            m.mergeCondition, m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions)
        case None => plan
      }
    case _ => plan
  }
}

/** `DELETE FROM t WHERE cond` → predicate tombstoning. Returns the
  * number of rows deleted.
  */
case class DvDeleteCommand(root: String, targetOutput: Seq[Attribute],
    cond: Expression) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_rows", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    // change data (opt-in): victim images and tombstone coordinates
    // come from ONE frozen scan (r14 ADVICE fix — the former
    // snapshot-then-mark pair left a window where a racing insert was
    // tombstoned but never recorded in the 'del' sidecar), keyed to a
    // metadata-only 'delete' commit — the retraction rows derived
    // consumers (IVM, replication) fold; snapshots are unaffected
    // (retroactive mask)
    val cdf = if (DV.cdfEnabled(session))
      Some(new DV.CdfStage(session, root)) else None
    try {
      val n = cdf match {
        case Some(c) =>
          DV.deleteWithChangeData(session, root, { scan =>
            val (proj, f, p) = DvDml.rebound(scan, targetOutput)
            GraftPlanApi.ofRows(session, Filter(cond, proj))
              .select(targetOutput.map(o =>
                GraftPlanApi.column(o).as(o.name)) :+
                GraftPlanApi.column(f).as("__file") :+
                GraftPlanApi.column(p).as("__pos"): _*)
          }, c)
        case None =>
          DV.markWhere(session, root, { scan =>
            val (proj, f, p) = DvDml.rebound(scan, targetOutput)
            GraftPlanApi.ofRows(session, Filter(cond, proj))
              .select(GraftPlanApi.column(f).as("__file"),
                GraftPlanApi.column(p).as("__pos"))
          })
      }
      if (n > 0 && cdf.exists(_.recorded))
        DV.commitChangeDataOnly(session, root, cdf.get): Unit
      Seq(Row(n))
    } finally cdf.foreach(_.cleanup())
  }
}

/** `UPDATE t SET ... WHERE cond` → merge-on-read: new images from the
  * pre-update masked state, old images tombstoned, one CAS append.
  * Returns the number of rows updated.
  */
case class DvUpdateCommand(root: String, targetOutput: Seq[Attribute],
    assignments: Seq[Assignment],
    cond: Option[Expression]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("updated_rows", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val condE = cond.getOrElse(Literal.TrueLiteral)
    val sets = DvDml.assignMap(assignments)
    // partition layout BEFORE mutating (recovered from live paths)
    val partCols = DV.partitionColsOf(session, root)
    // images from the PRE-update masked state, frozen before any
    // tombstone lands (the filter would see its own deletions)
    val (proj0, _, _) = DvDml.rebound(DV.readWithPos(session, root),
      targetOutput)
    val images = GraftPlanApi.ofRows(session, Filter(condE, proj0))
      .select(DvDml.imageCols(targetOutput, sets): _*)
      .localCheckpoint()
    // CHECK constraints validate the NEW images BEFORE any tombstone
    // lands — a rejected UPDATE must leave the table untouched
    DV.enforceConstraints(session, root, images)
    // change data (opt-in): snapshot the matched OLD rows before the
    // first tombstone, stage the new images — the commit keys them
    val cdf = if (DV.cdfEnabled(session))
      Some(new DV.CdfStage(session, root)) else None
    try {
      cdf.foreach { c =>
        c.writePre(GraftPlanApi.ofRows(session, Filter(condE, proj0))
          .select(targetOutput.map(o =>
            GraftPlanApi.column(o).as(o.name)): _*))
        c.writePost(images)
      }
      val marked = DV.markWhere(session, root, { scan =>
        val (proj, f, p) = DvDml.rebound(scan, targetOutput)
        GraftPlanApi.ofRows(session, Filter(condE, proj))
          .select(GraftPlanApi.column(f).as("__file"),
            GraftPlanApi.column(p).as("__pos"))
      })
      if (!images.isEmpty)
        DV.appendCommitted(session, root, partCols, images, None,
          "update",
          onCommitted = v => cdf.foreach(_.onCommitted(v)),
          extraFeatures = if (cdf.exists(_.recorded))
            Set("cdf-updates") else Set.empty): Unit
      Seq(Row(marked))
    } finally cdf.foreach(_.cleanup())
  }
}

/** `MERGE INTO t USING s ON cond WHEN ...` → one outer join of the
  * positional scan against the checkpointed source; each row takes
  * its clause group's FIRST action whose condition holds (the
  * standard MERGE rule); update/delete rows are tombstoned, update
  * images + inserts land as one CAS-committed append. A target row
  * matched (and modified) by more than one source row fails loudly —
  * the Delta multiple-matches contract. Returns (tombstoned rows,
  * appended rows).
  */
case class DvMergeCommand(root: String, targetOutput: Seq[Attribute],
    source: LogicalPlan, mergeCond: Expression,
    matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("tombstoned_rows", LongType, nullable = false)(),
    AttributeReference("appended_rows", LongType, nullable = false)())

  private def C(e: Expression): Column = GraftPlanApi.column(e)

  private def condOf(a: MergeAction): Column = {
    val c = a.condition.map(C).getOrElse(lit(true))
    a match {
      case _: UpdateAction | _: DeleteAction | _: InsertAction => c
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action ${other.getClass.getSimpleName} " +
          "(star actions should have been expanded by the analyzer)")
    }
  }

  /** 1-based index of the first action whose condition holds, 0 if
    * none — each row is classified by exactly one clause.
    */
  private def firstIdx(actions: Seq[MergeAction]): Column =
    actions.zipWithIndex.foldRight(lit(0): Column) {
      case ((a, i), rest) => when(condOf(a), lit(i + 1)).otherwise(rest)
    }

  override def run(session: SparkSession): Seq[Row] = {
    // a source reading the SAME table would have its exprIds deduped
    // by the self-join resolver, silently unbinding the resolved
    // action expressions — refuse rather than misroute
    source.foreach {
      case l: LogicalRelation => l.relation match {
        case d: DvRelation if d.root == root =>
          throw new UnsupportedOperationException(
            "MERGE INTO t USING t (self-merge) is not supported on " +
              "graft-dv tables")
        case _ => ()
      }
      case _ => ()
    }
    val partCols = DV.partitionColsOf(session, root)
    // freeze the source: evaluated exactly once, shared by the
    // classification, the images, and any fence re-marking
    // (localCheckpoint preserves output exprIds)
    val srcCk = GraftPlanApi.ofRows(session, source).localCheckpoint()
    val srcP = GraftPlanApi.analyzed(srcCk)
    val srcMark = Alias(Literal(true), "__graft_dml_src")()
    val srcDf = GraftPlanApi.ofRows(session,
      Project(srcP.output :+ srcMark, srcP))
    val srcPresent = C(srcMark.toAttribute)

    // keep only the sides an action group needs: matched pairs are
    // always there; source-only rows only if a NOT MATCHED clause
    // exists; target-only rows only for NOT MATCHED BY SOURCE
    val joinType =
      (notMatchedActions.nonEmpty, notMatchedBySourceActions.nonEmpty) match {
        case (true, true) => "full_outer"
        case (true, false) => "right_outer"
        case (false, true) => "left_outer"
        case (false, false) => "inner"
      }

    def joinedOf(scan: DataFrame): (DataFrame, Column, Column) = {
      val (proj, f, p) = DvDml.rebound(scan, targetOutput)
      val tgt = GraftPlanApi.ofRows(session, proj)
      (tgt.join(srcDf, C(mergeCond), joinType), C(f), C(p))
    }

    val (joined0, f0, p0) = joinedOf(DV.readWithPos(session, root))
    val matchedP = p0.isNotNull && srcPresent.isNotNull
    val notMatchedP = p0.isNull && srcPresent.isNotNull
    val bySourceP = p0.isNotNull && srcPresent.isNull
    val mIdx = firstIdx(matchedActions)
    val nIdx = firstIdx(notMatchedActions)
    val bIdx = firstIdx(notMatchedBySourceActions)

    if (matchedActions.nonEmpty) {
      val dup = joined0.filter(matchedP && mIdx > 0)
        .groupBy(f0.as("__f"), p0.as("__p"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
      require(dup == 0L,
        "MERGE: multiple source rows matched and would modify the " +
          "same target row — dedupe the source so each target row " +
          "matches at most once (the Delta MERGE multiple-matches rule)")
    }

    // new images from the PRE-merge state, frozen before tombstoning;
    // update-action frames tagged apart from insert-action ones so
    // the change-data sidecar can record POST-images (updates only —
    // inserts surface as plain 'insert' feed rows)
    def imagesOf(actions: Seq[MergeAction], pred: Column,
        idx: Column): Seq[(Boolean, DataFrame)] =
      actions.zipWithIndex.collect {
        case (u: UpdateAction, i) =>
          (true, joined0.filter(pred && idx === i + 1)
            .select(DvDml.imageCols(targetOutput,
              DvDml.assignMap(u.assignments)): _*))
        case (ins: InsertAction, i) =>
          (false, joined0.filter(pred && idx === i + 1)
            .select(DvDml.imageCols(targetOutput,
              DvDml.assignMap(ins.assignments)): _*))
      }
    val imageFrames =
      imagesOf(matchedActions, matchedP, mIdx) ++
        imagesOf(notMatchedActions, notMatchedP, nIdx) ++
        imagesOf(notMatchedBySourceActions, bySourceP, bIdx)
    val images = imageFrames.map(_._2).reduceOption(_ unionByName _)
      .map(_.localCheckpoint())
    // CHECK constraints validate the NEW images BEFORE any tombstone
    // lands — a rejected MERGE must leave the table untouched
    images.foreach(df => DV.enforceConstraints(session, root, df))

    // change data (opt-in): PRE = rows an UPDATE action claims (their
    // old images, snapshotted before the first tombstone); POST = the
    // update-action image frames; DELETE-action rows land in the
    // 'del' sidecar (the feed's 'delete' retraction rows — snapshots
    // stay governed by the retroactive mask)
    val cdf = if (DV.cdfEnabled(session))
      Some(new DV.CdfStage(session, root)) else None
    try {
      cdf.foreach { c =>
        def actIdx(actions: Seq[MergeAction],
            p: MergeAction => Boolean): Seq[Int] =
          actions.zipWithIndex.collect {
            case (a, i) if p(a) => i + 1 }
        val isUpd = (a: MergeAction) => a.isInstanceOf[UpdateAction]
        val isDel = (a: MergeAction) => a.isInstanceOf[DeleteAction]
        val preM = actIdx(matchedActions, isUpd)
        val preB = actIdx(notMatchedBySourceActions, isUpd)
        val pre = joined0.filter(
            (matchedP && mIdx.isin(preM: _*)) ||
              (bySourceP && bIdx.isin(preB: _*)))
          .select(targetOutput.map(o => C(o).as(o.name)): _*)
        val post = imageFrames.collect { case (true, df) => df }
          .reduceOption(_ unionByName _)
        if (post.isDefined) {
          c.writePre(pre)
          c.writePost(post.get)
        }
        val delM = actIdx(matchedActions, isDel)
        val delB = actIdx(notMatchedBySourceActions, isDel)
        if (delM.nonEmpty || delB.nonEmpty) {
          val del = joined0.filter(
              (matchedP && mIdx.isin(delM: _*)) ||
                (bySourceP && bIdx.isin(delB: _*)))
            .select(targetOutput.map(o => C(o).as(o.name)): _*)
          if (!del.isEmpty) c.writeDeleted(del)
        }
      }

      // tombstone every matched / by-source row an UPDATE or DELETE
      // action claimed (first-match, same classification as the
      // images) — re-runnable against a fresh scan for the purge fence
      val marked = DV.markWhere(session, root, { scan =>
        val (j, f, p) = joinedOf(scan)
        val mP = p.isNotNull && srcPresent.isNotNull
        val bP = p.isNotNull && srcPresent.isNull
        j.filter((mP && firstIdx(matchedActions) > 0) ||
            (bP && firstIdx(notMatchedBySourceActions) > 0))
          .select(f.as("__file"), p.as("__pos"))
      })

      val appended = images match {
        case Some(df) if !df.isEmpty =>
          DV.appendCommitted(session, root, partCols, df, None, "merge",
            onCommitted = v => cdf.foreach(_.onCommitted(v)),
            extraFeatures = if (cdf.exists(_.recorded))
              Set("cdf-updates") else Set.empty)
          df.count()
        case _ =>
          // a delete-only MERGE appends nothing, so without its own
          // (metadata-only) commit the recorded retraction rows would
          // never key to a feed step
          if (marked > 0 && cdf.exists(_.recorded))
            DV.commitChangeDataOnly(session, root, cdf.get): Unit
          0L
      }
      Seq(Row(marked, appended))
    } finally cdf.foreach(_.cleanup())
  }
}
