package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.rdd.RDD

/** The whole-operator tier of the custom-operator ladder: an as-of
  * join as a first-class Catalyst citizen — logical plan node, planner
  * strategy, and physical sort-merge operator — instead of the
  * union-window encoding in [[graft.ops.AsOfJoin]].
  *
  * Both forms have the same cost SHAPE (one exchange per side + sort),
  * but the native operator:
  *   - merges the two sorted streams directly: no union row widening
  *     (the union form materializes left∪right rows carrying both
  *     schemas), no window state per carried column — O(1) state, one
  *     buffered right row per key group;
  *   - declares its needs to the planner (`requiredChildDistribution`
  *     / `requiredChildOrdering`), so EnsureRequirements places the
  *     exchanges/sorts and AQE can re-plan them like any built-in
  *     join — nothing about the operator is hand-scheduled.
  *
  * Semantics (differential-tested against the union-window form in
  * AsOfJoinSpec): for every left row, the latest right row of the same
  * key with `r.ts <= l.ts` (`<` when strict); ties on ts resolve by
  * the tie-break column ascending, latest wins; right rows with null
  * ts never match; left rows with null ts get no match.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression],
                        rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightTb: Expression, strict: Boolean)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]; a no-op on every other
  * node, so it composes with the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, rtb, strict) =>
      AsOfJoinExec(lk, rk, lts, rts, rtb, strict,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. The planner guarantees (via the declared
  * distribution/ordering requirements) that each partition holds both
  * sides of every key hash-bucket, sorted by (keys, ts[, tb]); the
  * merge walks the two streams once, keeping only the latest
  * qualifying right row — O(1) state beyond the iterators. */
case class AsOfJoinExec(leftKeys: Seq[Expression],
                        rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightTb: Expression, strict: Boolean,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending), SortOrder(rightTb, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = lTsExpr.dataType
    val isStrict = strict
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      // bind against nullable-marked right attrs: BindReferences takes
      // nullability from the INPUT schema, and the null-fill row for
      // unmatched lefts must not be read as a zero-valued non-null row
      val resultProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression),
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead right row + its key/ts (copied: projections and
        // the child iterator reuse buffers)
        private var rNext: InternalRow = _
        private var rNextKey: InternalRow = _
        private var rNextTs: InternalRow = _
        private def fetchRight(): Unit =
          if (rNext == null && rIter.hasNext) {
            rNext = rIter.next().copy()
            rNextKey = rKeyProj(rNext).copy()
            rNextTs = rTsProj(rNext).copy()
          }
        // current left key group + latest qualifying right row in it
        private var groupKey: InternalRow = _
        private var lastMatch: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (groupKey == null || keyOrd.compare(lk, groupKey) != 0) {
            groupKey = lk.copy()
            lastMatch = null
          }
          val lts = lTsProj(l)
          val ltsNull = lts.isNullAt(0)
          var done = false
          while (!done) {
            fetchRight()
            if (rNext == null) done = true
            else {
              val cmp = keyOrd.compare(rNextKey, groupKey)
              if (cmp < 0) { // right group with no remaining left rows
                rNext = null
              } else if (cmp > 0 || ltsNull) {
                done = true
              } else if (!rNextTs.isNullAt(0) && {
                val c = tsOrd.compare(rNextTs, lts)
                if (isStrict) c < 0 else c <= 0
              }) {
                lastMatch = rNext // sorted by (ts, tb): last wins
                rNext = null
              } else if (rNextTs.isNullAt(0)) {
                rNext = null // null-ts right rows never match
              } else {
                done = true // right row is in this key's future
              }
            }
          }
          resultProj(joined(l,
            if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level front-end, contract-compatible with
  * [[graft.ops.AsOfJoin.asofJoin]]: carried right columns arrive as
  * `asof_<name>`. */
object NativeAsOfJoin {

  /** Idempotently install the planner strategy into a session (the
    * builder path is `spark.sql.extensions` →
    * [[graft.functions.GraftExtensions]]). */
  def install(spark: SparkSession): Unit =
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightCols: Seq[String],
               tieBreak: Option[String] = None,
               strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // Terminal self-aliases mint fresh exprIds on both sides, so a
    // self-as-of (left and right sharing lineage) cannot produce
    // ambiguous attribute bindings inside the custom node.
    val lDf = left.select(left.columns.map(c => col(c).as(c)).toSeq: _*)
    val rProj = (keys :+ tsCol).distinct ++
      rightCols.filterNot(c => keys.contains(c) || c == tsCol)
    val rDf = right
      .filter(col(tsCol).isNotNull)
      .select(rProj.map(c => col(c).as(c)) :+
        tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)).as("_tb"): _*)
    val lPlan = GraftBridge.analyzed(lDf)
    val rPlan = GraftBridge.analyzed(rDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"missing column $name"))
    // The exec's orderings are built from the LEFT side's types and
    // compare rows projected from BOTH sides — a type mismatch would
    // read garbage bytes and mis-join silently, so fail fast here.
    (keys :+ tsCol).foreach { c =>
      val (lt, rt) = (attr(lPlan, c).dataType, attr(rPlan, c).dataType)
      require(lt == rt,
        s"as-of column '$c' must have the same type on both sides " +
          s"(left: $lt, right: $rt); cast before joining")
    }
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, tsCol), attr(rPlan, tsCol), attr(rPlan, "_tb"), strict)
    val joined = GraftBridge.ofRows(spark, node)
    val leftCols: Seq[Column] = lPlan.output.map(GraftBridge.column)
    val asofCols: Seq[Column] = rightCols.map(c =>
      GraftBridge.column(attr(rPlan, c)).as(s"asof_$c"))
    joined.select(leftCols ++ asofCols: _*)
  }
}
