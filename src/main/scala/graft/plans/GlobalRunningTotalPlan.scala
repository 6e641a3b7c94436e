package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, WindowExpression, WindowSpecDefinition, SpecifiedWindowFrame, RowFrame, UnboundedPreceding, CurrentRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** GLOBAL running total as a first-class plan: logical node -> optimizer
  * Rule -> Strategy -> UnaryExecNode — the third rung of the custom-
  * operator ladder ([[AsOfJoinPlan]] covers Strategy+Exec; this adds the
  * injected `Rule[LogicalPlan]`, so users WRITE the naive
  * `sum(x).over(Window.orderBy(k).rowsBetween(unboundedPreceding,
  * currentRow))` and the engine plans it WITHOUT the single-task window
  * (empty PARTITION BY hash-partitions everything into ONE task — the
  * canonical 100 TB running-total scale killer).
  *
  * Physical shape: EnsureRequirements range-partitions + sorts the child
  * (OrderedDistribution); pass 1 folds each partition to ONE long
  * (O(partitions) control data, cluster-bounded), the exclusive prefix
  * broadcasts back; pass 2 is a map-only accumulate. Pass 2 re-reads the
  * child from the exchange's shuffle files (same RDD object, same
  * partitioner instance — deterministic), so facts shuffle once.
  *
  * Rewrite preconditions (checked by [[RewriteGlobalRunningTotal]]):
  * single window expression, empty partition spec, one ASC order
  * attribute, ROWS UNBOUNDED PRECEDING..CURRENT ROW frame, and a
  * NON-NULLABLE LongType sum operand (Sum's null-skipping semantics
  * diverge on leading nulls, so nullable operands keep the builtin
  * window).
  */
case class GlobalRunningTotalPlan(child: LogicalPlan,
                                  orderAttr: Attribute,
                                  valueAttr: Attribute,
                                  // constructor member (NOT derived): a
                                  // fresh exprId per copy() would orphan
                                  // parent references during transforms
                                  cumAttr: AttributeReference)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ cumAttr
  override def references: AttributeSet = AttributeSet(child.output)
  override protected def withNewChildInternal(
      c: LogicalPlan): GlobalRunningTotalPlan = copy(child = c)
}

object GlobalRunningTotalStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRunningTotalPlan(c, o, v, cum) =>
      GlobalRunningTotalExec(planLater(c), o, v, cum) :: Nil
    case _ => Nil
  }
}

case class GlobalRunningTotalExec(child: SparkPlan,
                                  orderAttr: Attribute,
                                  valueAttr: Attribute,
                                  cumAttr: Attribute) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ cumAttr

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(Seq(SortOrder(orderAttr, Ascending))))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(orderAttr, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(orderAttr, Ascending))

  // the range exchange below survives unchanged (we only append a
  // column), so a downstream global ORDER BY on the same key needs no
  // second exchange/sort
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val valIdx = child.output.indexWhere(_.exprId == valueAttr.exprId)
    require(valIdx >= 0, s"value $valueAttr missing in ${child.output}")
    // pass 1: ONE long per partition — cluster-bounded control data.
    // Only the long is read, so sorter row-buffer reuse is safe.
    val rdd = child.execute()
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(valIdx))
      Iterator((pid, s))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](rdd.getNumPartitions)
    var acc = 0L
    partSums.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val bc = sparkContext.broadcast(offsets)
    // pass 2: map-only accumulate + offset over the SAME rdd (shuffle
    // files are reused; partition ids agree between passes)
    val outAttrs = output
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val cumRow = new GenericInternalRow(1)
      var run = bc.value(pid)
      it.map { r =>
        run += r.getLong(valIdx)
        cumRow.update(0, run)
        proj(joined(r, cumRow))
      }
    }
  }

  override protected def withNewChildInternal(
      c: SparkPlan): GlobalRunningTotalExec = copy(child = c)
}

/** Injected optimizer rule: rewrites the naive single-task global
  * running-total (and running-count) Window into
  * [[GlobalRunningTotalPlan]], aliasing the new cum attribute back
  * under the ORIGINAL exprId so parent plans are untouched.
  *
  * Overflow note: the accumulate wraps like Java long addition; a sum
  * that overflows Long is out of contract for both the builtin window
  * and this operator (the library's exact-decimal cents convention
  * bounds magnitudes long before that).
  */
object RewriteGlobalRunningTotal extends Rule[LogicalPlan] {

  /** The frame shape `ROWS UNBOUNDED PRECEDING .. CURRENT ROW` over a
    * single global ASC order attribute.
    */
  private object GlobalRunningFrame {
    def unapply(w: WindowSpecDefinition): Option[AttributeReference] = w match {
      // the exec's requiredChildOrdering is plain ASC (= NULLS FIRST);
      // an ASC NULLS LAST order over a NULLABLE key would silently
      // accumulate null-key rows in a different position than the
      // builtin window — only accept orders the exec reproduces
      case WindowSpecDefinition(Nil, Seq(SortOrder(o: AttributeReference,
            Ascending, no, _)),
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
          if no == org.apache.spark.sql.catalyst.expressions.NullsFirst ||
            !o.nullable =>
        Some(o)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // running SUM over a non-nullable long (Sum's leading-null
    // semantics diverge on nullable operands — those keep the builtin)
    case Window(
          Seq(a @ Alias(
            WindowExpression(
              AggregateExpression(Sum(v: AttributeReference, _), _, false, _, _),
              GlobalRunningFrame(o)),
            _)),
          Nil, _, child, _)
        if v.dataType == LongType && !v.nullable &&
          child.outputSet.contains(v) && child.outputSet.contains(o) =>
      val node = GlobalRunningTotalPlan(child, o, v,
        AttributeReference("_cum", LongType, nullable = false)())
      Project(child.output :+ Alias(node.cumAttr, a.name)(exprId = a.exprId),
        node)

    // running COUNT of a non-null literal (count(1)/count(*) form):
    // the running total of a planted constant-1 column — no null
    // caveat, count skips nothing
    case Window(
          Seq(a @ Alias(
            WindowExpression(
              AggregateExpression(
                Count(Seq(l: org.apache.spark.sql.catalyst.expressions.Literal)),
                _, false, _, _),
              GlobalRunningFrame(o)),
            _)),
          Nil, _, child, _)
        if l.value != null && child.outputSet.contains(o) =>
      val one = Alias(org.apache.spark.sql.catalyst.expressions.Literal(1L),
        "_one")()
      val node = GlobalRunningTotalPlan(
        Project(child.output :+ one, child), o, one.toAttribute,
        AttributeReference("_cum", LongType, nullable = false)())
      // drop the planted _one from the output: project back to the
      // original columns + the aliased count
      Project(child.output :+ Alias(node.cumAttr, a.name)(exprId = a.exprId),
        node)
  }
}
