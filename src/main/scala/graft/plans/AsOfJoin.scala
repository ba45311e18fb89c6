package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSeq, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native ASOF JOIN — the whole-operator extension path (SURVEY §2 E):
  * a custom logical node, an injected planner strategy, and a physical
  * sort-merge exec, registered through `SparkSessionExtensions` (the
  * brief's option (c) — used here because Spark genuinely lacks the
  * operator and the composed alternatives either nested-loop (a θ-join
  * on `rt <= t`) or pay a window sort (B9's union+carry rewrite).
  *
  * Semantics (inner as-of, B9's exactly): for each left row (k, t),
  * match the right row with the same key and the LARGEST (rt, tie)
  * such that rt <= t; left rows with no qualifying right row drop out.
  * The (rt, tie) max matches B9's `max(struct(c_us, c_id))` tie rule.
  *
  * Physical contract — this is where the operator earns its place:
  *  - `requiredChildDistribution` co-clusters both sides on the key,
  *    so EnsureRequirements inserts ONE hash exchange per side (or
  *    none if the child is already partitioned right — e.g. a bucketed
  *    scan or an upstream aggregate on the same key);
  *  - `requiredChildOrdering` asks for (key, time[, tie]) ascending,
  *    so the planner's SortExec (or an already-sorted child) feeds the
  *    merge — the join itself is then a single forward pass per
  *    partition, zero per-row allocation, O(|L| + |R|);
  *  - `outputOrdering`/`outputPartitioning` republish the left side's,
  *    so a downstream per-key window or agg reuses the sort for free.
  *
  * Skew note: like any per-key sort-merge join, one pathological key
  * sorts in one task; B9's time-cell rewrite remains the skew-armored
  * form of the same semantics (both are spec-pinned equal). At 100 TB
  * the exec is the right default and the cell rewrite the hot-key
  * escape hatch.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, leftTime).forall(e => e.resolved &&
      e.references.subsetOf(left.outputSet)) &&
    Seq(rightKey, rightTime, rightTie).forall(e => e.resolved &&
      e.references.subsetOf(right.outputSet))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
    ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(leftKey, AttributeSeq(lOut))
      val lt = BindReferences.bindReference(leftTime, AttributeSeq(lOut))
      val rk = BindReferences.bindReference(rightKey, AttributeSeq(rOut))
      val rt = BindReferences.bindReference(rightTime, AttributeSeq(rOut))
      val toUnsafe = UnsafeProjection.create(output, lOut ++ rOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey = 0L
        private var rHeadTime = 0L
        private var rHeadValid = false
        // latest qualifying right row for storedKey, already copied
        private var stored: InternalRow = _
        private var storedKey = 0L
        private var nextOut: InternalRow = _

        private def advanceRight(): Unit = {
          rHeadValid = false
          while (!rHeadValid && rIter.hasNext) {
            val r = rIter.next()
            val k = rk.eval(r)
            val t = rt.eval(r)
            if (k != null && t != null) {
              rHead = r
              rHeadKey = k.asInstanceOf[Long]
              rHeadTime = t.asInstanceOf[Long]
              rHeadValid = true
            }
          }
          if (!rHeadValid) rHead = null
        }

        advanceRight()

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            val kAny = lk.eval(l)
            val tAny = lt.eval(l)
            if (kAny != null && tAny != null) {
              val k = kAny.asInstanceOf[Long]
              val t = tAny.asInstanceOf[Long]
              // consume right rows up to (k, t]; remember the last one
              // with key k — right is (key, time, tie)-sorted, so the
              // last consumed IS the max qualifying match
              while (rHeadValid &&
                  (rHeadKey < k || (rHeadKey == k && rHeadTime <= t))) {
                if (rHeadKey == k) {
                  stored = rHead.copy()
                  storedKey = k
                }
                advanceRight()
              }
              if (stored != null && storedKey == k) {
                nextOut = toUnsafe(joined(l, stored))
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextOut == null) computeNext()
          nextOut != null
        }

        override def next(): InternalRow = {
          if (nextOut == null) computeNext()
          val out = nextOut
          nextOut = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry point: `AsOfJoin.asof(errors, clicks, ...)` builds
  * the logical node against the ANALYZED child plans (attributes are
  * resolved positionally from each frame's own output, so the node is
  * born resolved and flows through analysis untouched).
  */
object AsOfJoin {
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTie: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def res(p: LogicalPlan, n: String, mustBeLong: Boolean): Attribute = {
      val a = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
      // The exec's merge kernel evals KEY and TIME as Long — fail fast at
      // plan-build time instead of a ClassCastException mid-execution.
      // The tie-break column is only consumed through requiredChildOrdering
      // (any orderable type works there), so it is exempt.
      require(!mustBeLong || a.dataType == org.apache.spark.sql.types.LongType,
        s"asof column $n must be BIGINT, got ${a.dataType.simpleString}")
      a
    }
    GraftBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, res(lp, leftKey, true), res(rp, rightKey, true),
        res(lp, leftTime, true), res(rp, rightTime, true),
        res(rp, rightTie, false)))
  }

  /** SQL-less symmetry helper for specs: expose the exec class name. */
  val execName: String = classOf[AsOfJoinExec].getSimpleName
}
