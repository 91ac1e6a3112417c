package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
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

  // Both children must be hash-clustered on the key with EQUAL partition
  // counts (the zipPartitions merge is positional). Pinning an explicit
  // count is only needed when the children's existing layouts could
  // otherwise end up unequal — pinning unconditionally (as a first cut of
  // this operator did) forces both sides to exactly
  // conf.numShufflePartitions and blocks AQE from coalescing a small
  // input's exchanges.
  override def requiredChildDistribution: Seq[Distribution] = {
    val bareL = ClusteredDistribution(Seq(leftKey))
    val bareR = ClusteredDistribution(Seq(rightKey))
    val lSat = left.outputPartitioning.satisfies(bareL)
    val rSat = right.outputPartitioning.satisfies(bareR)
    if (lSat && rSat &&
        left.outputPartitioning.numPartitions == right.outputPartitioning.numPartitions) {
      // already co-partitioned: accept as-is, no exchange
      Seq(bareL, bareR)
    } else if (!lSat && !rSat) {
      // both sides get fresh sibling exchanges: EnsureRequirements gives
      // each conf.numShufflePartitions, and AQE's CoalesceShufflePartitions
      // treats sibling shuffle stages under one consumer as a single
      // coalesce group with identical partition specs — counts stay equal
      // and co-partitioning is preserved while a small input may coalesce
      // far below the static default
      Seq(bareL, bareR)
    } else {
      // asymmetric (one side pre-clustered) or counts disagree: pin both to
      // the pre-clustered side's count so that side keeps its layout and
      // only the other side is exchanged
      val n = if (lSat) left.outputPartitioning.numPartitions
              else if (rSat) right.outputPartitioning.numPartitions
              else conf.numShufflePartitions
      Seq(ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(n)),
          ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(n)))
    }
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
    // serializable ingredients for the per-partition generated kernels:
    //  - a 2-field (key, ts) extraction UnsafeProjection per side
    //  - codegen'd orderings over field 0 (key) and field 1 (ts)
    // versus the first cut's per-row interpreted `expr.eval` + boxed
    // TypeUtils orderings, every comparison below is generated code over
    // UnsafeRows (compiled once per partition, cached by code shape).
    val lKeyTs: Seq[Expression] = Seq(leftKey, leftTs)
    val rKeyTs: Seq[Expression] = Seq(rightKey, rightTs)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val rightWidth = right.output.size
    val outAttrs = output
    val lOut = left.output
    val rOut = right.output

    val lRdd = left.execute()
    val rRdd = right.execute()
    // positional merge precondition; requiredChildDistribution guarantees
    // this, so a violation is a planner bug — fail loud, not row-garbage
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children must have equal partition counts, got " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")

    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val lProj = UnsafeProjection.create(lKeyTs, lOut)
      val rProj = UnsafeProjection.create(rKeyTs, rOut)
      val keyOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, keyType, nullable = true), Ascending)))
      val tsOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(1, tsType, nullable = true), Ascending)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKT: InternalRow = null

      lIter.map { lRow =>
        val lKT = lProj(lRow)
        if (lKT.isNullAt(0) || lKT.isNullAt(1)) {
          // null key/ts never matches (ASOF join null semantics); the sort
          // puts null-key rows first, so no right-side state is disturbed
          proj(joined(lRow, nullRight))
        } else {
          // advance the right side through every row at or before (k, t)
          var advancing = true
          while (advancing && rCur != null) {
            val rKT = rProj(rCur)
            if (rKT.isNullAt(0) || rKT.isNullAt(1)) {
              // null-keyed right rows sort first and match nothing: skip
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              val c = keyOrd.compare(rKT, lKT)
              if (c < 0) {
                // earlier key: skip (its matches can never serve later keys)
                rCur = if (rIter.hasNext) rIter.next() else null
              } else if (c == 0 && tsOrd.compare(rKT, lKT) <= 0) {
                lastMatch = rCur.copy() // candidate; later ones overwrite (latest wins)
                lastMatchKT = rKT.copy() // projection buffer is reused: copy
                rCur = if (rIter.hasNext) rIter.next() else null
              } else advancing = false
            }
          }
          val matched = lastMatch != null && lastMatchKT != null &&
            keyOrd.compare(lastMatchKT, lKT) == 0
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
