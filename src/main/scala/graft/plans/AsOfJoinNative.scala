package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward as-of join as a NATIVE Catalyst operator — custom `LogicalPlan`
  * node + `SparkStrategy` + `SparkPlan`, the (c) rung of the extension
  * ladder, for the one relational shape Spark's planner genuinely lacks
  * (no reference analog either: SURVEY §2 lists inner equi-join only).
  *
  * Semantics match [[graft.ops.AsOfJoin.backward]] (DuckDB `ASOF JOIN`):
  * each left row picks the LATEST right row of the same key with
  * `rightTime <= leftTime`.
  *
  * Physical shape: both sides hash-partitioned by key and sorted by
  * (key, time) — `requiredChildDistribution`/`requiredChildOrdering`, so
  * `EnsureRequirements` plans the exchanges/sorts — then ONE streaming merge
  * pass per partition holding O(1) state (the current best match), emitting
  * rows in left order. Compare with the union+window formulation (one
  * shuffle of |L|+|R| but a full per-key sort materializing BOTH inputs in
  * the window buffer): here the right side is never buffered at all, which
  * is the difference at 100 TB when the right side (the quote/click stream)
  * is the big one.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    inner: Boolean)
    extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length, "as-of join needs equi-keys")

  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output else right.output.map(_.withNullability(true)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Registered either via
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.functions.GraftFunctions.GraftExtensions]]) or lazily through
  * `spark.experimental.extraStrategies` by [[AsOfJoinNative.backward]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, inner) =>
      AsOfJoinExec(lk, rk, lt, rt, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Streaming merge as-of join. Children arrive co-partitioned by key and
  * sorted by (key, time); a single forward pass per partition keeps exactly
  * one buffered right row (the current best match) — no per-key
  * materialization on either side.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    inner: Boolean,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output else right.output.map(_.withNullability(true)))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    // Tie-break determinism: the merge keeps the LAST right row seen at equal
    // (key, time), so the right sort must totally order ties — append the
    // remaining right columns (ascending ⇒ the kept row is their max), which
    // matches the window formulation's full-struct tiebreak exactly: within a
    // tie the key/time fields compare equal, so struct comparison reduces to
    // the other columns in declaration order. Non-orderable columns (maps)
    // are skipped — same rows the struct sort would reject outright.
    val tieBreak = right.output
      .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType))
      .map(SortOrder(_, Ascending))
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)) ++ tieBreak)
  }

  // left row order is preserved, so the left ordering/partitioning survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val isInner = inner
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind right side as nullable: outer emits an all-null right row, and
      // a projection bound to the child's non-null attrs would skip the
      // null checks and read zeros
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTime: UnsafeRow = null
      // NULL right time never matches (SQL comparison semantics, matching
      // the DuckDB ASOF oracle): such rows are skipped outright — without
      // this, RowOrdering's nulls-first order would make a null-time right
      // row the "earliest" of its key and match every left row.
      def advance(): Unit = {
        var skip = true
        while (skip)
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            rTime = rTimeProj(rRow)
            skip = rTime.isNullAt(0)
          } else { rRow = null; skip = false }
      }
      advance()

      // the single buffered candidate: latest right row seen for its key
      var matchRow: InternalRow = null
      var matchKey: UnsafeRow = null

      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        var continue = rRow != null
        while (continue) {
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && timeOrd.compare(rTime, lTime) <= 0)) {
            if (c == 0) { matchRow = rRow.copy(); matchKey = rKey.copy() }
            advance()
            continue = rRow != null
          } else continue = false
        }
        val matched = matchRow != null && keyOrd.compare(matchKey, lKey) == 0
        if (matched) Iterator.single(resultProj(joiner(l, matchRow)))
        else if (!isInner) Iterator.single(resultProj(joiner(l, nullRight)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native operator. */
object AsOfJoinNative {

  /** Same contract as [[graft.ops.AsOfJoin.backward]] (column-name keys,
    * `rightPrefix` applied to right columns, `inner` drops unmatched left
    * rows), planned through [[AsOfJoinExec]] instead of union+window.
    * Null semantics are identical to the window formulation: null keys group
    * and match (NULL == NULL — documented divergence from DuckDB), null
    * right times never match, null left times match nothing. Ties on equal
    * (key, time) resolve to the right row with maximum remaining columns —
    * same row both formulations (and reruns) pick.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "r_",
      inner: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = GraftColumnBridge.analyzed(left)
    // Re-alias the right side with fresh exprIds: a self-join (the common
    // as-of shape — one event stream filtered two ways) would otherwise
    // carry conflicting attribute ids into the custom node, which the
    // analyzer's dedup rules only rewrite for nodes they know.
    val rPlan = Project(
      GraftColumnBridge.analyzed(right).output.map(a => Alias(a, a.name)()),
      GraftColumnBridge.analyzed(right))
    def find(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found among ${out.map(_.name).mkString(", ")}"))
    val plan = AsOfJoinPlan(
      lPlan,
      rPlan,
      Seq(find(lPlan.output, leftKey)),
      Seq(find(rPlan.output, rightKey)),
      find(lPlan.output, leftTime),
      find(rPlan.output, rightTime),
      inner)
    GraftColumnBridge
      .ofRows(spark, plan)
      .toDF(left.columns.toIndexedSeq ++ right.columns.map(rightPrefix + _): _*)
  }

  /** Idempotently register the strategy on an already-built session (the
    * builder-time path is `withExtensions(new GraftExtensions)`).
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}
