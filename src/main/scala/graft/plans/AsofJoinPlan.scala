package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: each left row matched to the LATEST right row with
  * the same key and time ≤ the left row's time (inner form — unmatched
  * left rows are dropped).
  *
  * This is the reference's "look up the most recent state for this
  * record" semantics (the window-form equivalent is
  * [[graft.queries.AsofQueries.joinAsof]]) as a whole-operator
  * implementation — the (c) tier of the custom-operator ladder:
  * LogicalPlan + SparkStrategy + SparkPlan, injected via
  * `SparkSessionExtensions.injectPlannerStrategy` or
  * `spark.experimental.extraStrategies`.
  *
  * Scale shape: identical to a sort-merge join — both children are
  * hash-CLUSTERED on the key (one shuffle each, co-partitioned by
  * EnsureRequirements) and sorted within partitions by (key, time); the
  * per-partition merge then streams BOTH sides once with O(1) state (the
  * current candidate right row), never materializing a per-key buffer.
  * At 100 TB that is strictly better than the union+window form, which
  * carries every right column through the unioned sort and holds the
  * window frame open per key; here the right side is consumed and
  * dropped as the merge advances.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (`Rule[LogicalPlan]` — the (c)-tier hook next to the
  * Strategy): push LEFT-side filter conjuncts below an [[AsofJoin]].
  *
  * Catalyst's own PushDownPredicates only understands built-in nodes,
  * so without this rule a `WHERE left_col = …` above an as-of join
  * stays above it and the scan underneath reads everything. Left
  * conjuncts commute with the join because each left row appears at
  * most once in the output and its match doesn't depend on other left
  * rows. RIGHT-side conjuncts must NOT be pushed: a post-join filter
  * on right columns rejects pairs whose LATEST row fails it, while a
  * pre-join filter would instead match the latest row AMONG the
  * survivors — different semantics. Non-deterministic predicates stay
  * put (standard pushdown contract). Once pushed, the built-in rules
  * take over and drive the filter into the parquet scan
  * (plan-asserted in AsofNativeSpec).
  */
object PushFilterThroughAsofJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsofJoin) =>
      val (pushable, rest) =
        splitConjunctivePredicates(cond).partition { p =>
          p.deterministic && p.references.subsetOf(j.left.outputSet)
        }
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner rule: AsofJoin (logical) → AsofJoinExec (physical). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join executor.
  *
  * Required child layout (enforced by EnsureRequirements, exactly as for
  * SortMergeJoinExec): both sides clustered on their key and sorted by
  * (key asc, time asc). The merge keeps one candidate right row per
  * current key — because the right side is time-ascending, the last
  * right row consumed with key = k and time ≤ t IS the as-of match.
  * Null keys/times never match (standard join-key semantics).
  */
case class AsofJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // left child's sort survives the merge (the right side adds columns,
  // not order) — lets a downstream key-ordered consumer skip its sort
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(leftKey, lOut)
      val lTime = BindReferences.bindReference(leftTime, lOut)
      val rKey = BindReferences.bindReference(rightKey, rOut)
      val rTime = BindReferences.bindReference(rightTime, rOut)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)
      // candidate = copy of the latest right row consumed for its key;
      // UnsafeRow.copy() owns its buffer, so key/time re-derived from it
      // stay valid after the iterator moves on
      var candidate: InternalRow = null
      lIter.flatMap { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k == null || t == null) None
        else {
          // consume right rows that are at-or-before (k, t); the last
          // one with key == k becomes the candidate
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rKey.eval(head)
            val ht = rTime.eval(head)
            if (hk == null || ht == null) { rBuf.next() } // never matches
            else {
              val c = keyOrd.compare(hk, k)
              if (c < 0) { rBuf.next(); candidate = null }
              else if (c == 0 && timeOrd.compare(ht, t) <= 0) {
                candidate = rBuf.next().copy()
              } else advancing = false
            }
          }
          if (candidate != null && keyOrd.compare(rKey.eval(candidate), k) == 0)
            Some(outProj(joined(lRow, candidate)))
          else { if (candidate != null && keyOrd.compare(rKey.eval(candidate), k) < 0) candidate = null; None }
        }
      }
    }
  }
}
