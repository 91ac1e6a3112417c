package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator custom Catalyst surface (SURVEY.md §4 tier (c), guide
  * §"Custom operator"): the as-of join Spark lacks natively, as a
  * LogicalPlan + Strategy + partition-wise merge SparkPlan.
  *
  * Semantics: LEFT OUTER AS-OF — every left row, joined to the single
  * latest right row with the same key and `rightTs <= leftTs`, else nulls.
  *
  * Physical plan: both children hash-clustered on the key (EnsureRequirements
  * inserts the exchanges) and sorted by (key, ts); each co-partition pair is
  * merged in ONE forward pass with O(1) state (the last matching right row).
  * Versus the union+window formulation (`Relational.asofJoin`) this avoids
  * materializing the combined sorted window stream; versus a range join it
  * never builds a candidate set. That is exactly the shape a 100 TB as-of
  * alignment wants: shuffle each side once, stream-merge, no blow-up.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  // right side is nullable in the output (unmatched left rows)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Pin BOTH children to the same explicit partition count: a bare
  // ClusteredDistribution would accept any pre-existing hash clustering on
  // the key, so AQE or an upstream repartition could hand the two children
  // DIFFERENT partition counts and the zipPartitions below would throw at
  // runtime. With requiredNumPartitions set, EnsureRequirements re-shuffles
  // any child whose count disagrees; AQE's partition coalescing is applied
  // uniformly across sibling shuffles, so co-partitioning is preserved.
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = conf.numShufflePartitions
    Seq(ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(n)),
        ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(n)))
  }

  // Right-side tiebreak over all remaining orderable columns: rows sharing
  // (key, ts) otherwise resolve by shuffle-arrival order, and "latest wins"
  // would be nondeterministic run to run.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val rightTiebreak = right.output
      .filterNot(a => rightKey.references.contains(a) || rightTs.references.contains(a))
      .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType))
      .map(a => SortOrder(a, Ascending))
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++ rightTiebreak)
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIter.map { lRow =>
        val k = lk.eval(lRow)
        val t = lt.eval(lRow)
        if (k == null || t == null) {
          // null key/ts never matches (ASOF join null semantics); the sort
          // puts null-key rows first, so no right-side state is disturbed
          proj(joined(lRow, nullRight))
        } else {
          // advance the right side through every row at or before (k, t)
          var advancing = true
          while (advancing && rCur != null) {
            val rKeyV = rk.eval(rCur)
            val rTsV = if (rKeyV == null) null else rt.eval(rCur)
            if (rKeyV == null || rTsV == null) {
              // null-keyed right rows sort first and match nothing: skip
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              val c = keyOrd.compare(rKeyV.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
              if (c < 0) {
                // earlier key: skip (its matches can never serve later keys)
                rCur = if (rIter.hasNext) rIter.next() else null
              } else if (c == 0 &&
                  tsOrd.lteq(rTsV.asInstanceOf[AnyRef], t.asInstanceOf[AnyRef])) {
                lastMatch = rCur.copy() // candidate; later ones overwrite (latest wins)
                lastMatchKey = rKeyV
                rCur = if (rIter.hasNext) rIter.next() else null
              } else advancing = false
            }
          }
          val matched = lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
          proj(joined(lRow, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** Install the planner strategy once per session (idempotent). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** DataFrame-level door: left as-of right on key/ts column names. */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side to fresh exprIds: custom nodes bypass the
    // analyzer's join-dedup, so a self-join would otherwise share attribute
    // ids across children and break binding/pruning
    val rPlan = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    Bridge.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTs), attr(rPlan, rightTs)))
  }
}
