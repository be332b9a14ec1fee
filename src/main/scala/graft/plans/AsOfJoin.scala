package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical as-of join — the whole-operator custom-plan axis of the
  * engine's Spark extensions (next to the codegen'd `ArrayDot`
  * Expression, the `DotProductRewrite` optimizer Rule, the `KmvSketch`
  * Aggregator and the mwrev DataSource V2).
  *
  * Semantics (mirrors DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`, the oracle the driver checks against): for every left
  * row, attach the single right row with the same key and the greatest
  * `rightTime <= leftTime`; left rows with no such right row keep the
  * right columns as nulls. `rightTieBreak` columns order right rows
  * WITHIN an equal (key, time) so the survivor is deterministic on any
  * input (DataFrame composition can't promise that; a physical merge
  * can).
  *
  * Why a custom operator instead of the union-and-carry-forward window
  * (q70, `RelationalOps`): the compositional form materializes both
  * streams through ONE window sort and carries state across the merged
  * timeline — correct and distributed, but it shuffles the union and
  * cannot expose the right side's columns without a second self-join.
  * The physical operator keys BOTH sides with an ordinary hash
  * exchange, sorts each side once, and streams a per-partition merge
  * with O(1) state — at 100 TB that is two key-partitioned shuffles
  * (the theoretical floor for a big-big as-of), no carried union, and
  * the full right row comes along for free.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted co-partitioned merge as-of join.
  *
  * Required layout (EnsureRequirements provides it): both children
  * hash-clustered on their keys with compatible partitioning, each
  * sorted by (keys, time[, tieBreak]). Execution zips the co-partitioned
  * children and streams one forward-only merge per partition: advance
  * the right iterator while (rkey, rtime) <= (lkey, ltime), remembering
  * the last equal-key row seen — that row IS the as-of match, because
  * the right side arrives time-ordered. Per-partition state is a single
  * buffered right row; nothing is ever rewound, so skew on the time
  * axis costs memory O(1) and the operator is spill-free by
  * construction.
  *
  * Null semantics match the SQL predicate `l.k = r.k AND l.t >= r.t`:
  * a NULL key or time never satisfies it, so right rows with any null
  * key/time are skipped during the merge and left rows with any null
  * key/time emit the null-extended right side. (The natural ascending
  * ordering used for the merge sorts nulls first, which would otherwise
  * equi-match NULL keys and treat a NULL time as "earliest".)
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  // one exchange + sort per side, then order-preserving streaming merge
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext,
      "number of rows with an as-of match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val keyTypes = leftKeys.map(_.dataType)
    val fullTypes = keyTypes :+ leftTime.dataType
    val rightArity = right.output.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (keys..., time) rows for the prefix comparisons below
      val lFullProj = UnsafeProjection.create(leftKeys :+ leftTime, left.output)
      val rFullProj = UnsafeProjection.create(rightKeys :+ rightTime, right.output)
      val fullOrd = RowOrdering.createNaturalAscendingOrdering(fullTypes)
      // same ordering over the key PREFIX only (bound refs 0..k-1)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)

      new Iterator[InternalRow] {
        // single-row lookahead; copies own their memory (sorter rows
        // are reused by the child iterator)
        private var rHead: InternalRow = _
        private var rHeadFull: InternalRow = _
        private var lastMatch: InternalRow = _
        private var lastMatchFull: InternalRow = _
        private def advanceRight(): Unit = {
          rHead = null; rHeadFull = null
          // null key/time can never satisfy l.k = r.k AND l.t >= r.t
          while (rHead == null && rIter.hasNext) {
            val candidate = rIter.next()
            val candidateFull = rFullProj(candidate)
            if (!candidateFull.anyNull) {
              rHead = candidate.copy()
              rHeadFull = candidateFull.copy()
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lFull = lFullProj(l)
          if (lFull.anyNull) {
            // nulls sort first, so no right-side state is skipped by
            // emitting the unmatched row without advancing the merge
            numOutputRows += 1
            return resultProj(joined(l, nullRight))
          }
          while (rHead != null && fullOrd.compare(rHeadFull, lFull) <= 0) {
            if (keyOrd.compare(rHeadFull, lFull) == 0) {
              lastMatch = rHead; lastMatchFull = rHeadFull
            }
            advanceRight()
          }
          val matched =
            lastMatchFull != null && keyOrd.compare(lastMatchFull, lFull) == 0
          if (matched) numMatchedRows += 1
          numOutputRows += 1
          resultProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
