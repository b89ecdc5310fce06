package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeReference, CreateStruct, CurrentRow, Expression, GetStructField, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PosExplode, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{IntegerType, StructType}

import graft.functions.expressions.TopKRows

/** Optimizer rule: rewrite the classic top-k-per-group idiom
  *
  *   Filter(rn <= k, Window([row_number() OVER (PARTITION BY g ORDER BY s)
  *                           AS rn], g, s, child))
  *
  * into a bounded-heap partial aggregate + posexplode:
  *
  *   Project(child.* , pos+1 AS rn,
  *     Generate(posexplode(topk),
  *       Aggregate(g, [topkrows(s-order, struct(child.*), k) AS topk], child)))
  *
  * Why: the window form has NO partial phase — every input row shuffles
  * into one reducer per group and the whole group is sorted there. The
  * aggregate form shuffles ≤ k rows per group per input partition and
  * never sorts more than k entries — the difference between a
  * single-reducer funnel and a scalable reduction at corpus scale.
  *
  * Strictly opt-in (`spark.graft.topkRewrite.enabled=true`, registered via
  * [[graft.GraftExtensions]]) and deliberately conservative; the rewrite
  * only fires when:
  *   - the Window computes EXACTLY ONE window expression, a row_number()
  *     with its standard (RowFrame, UnboundedPreceding, CurrentRow) frame;
  *   - the filter is a single `rn <= k` / `rn < k` / reversed comparison
  *     against an integer literal, with k ≤ spark.graft.topkRewrite.maxK
  *     (default 1000 — the per-group heap must stay small);
  *   - every partition/order expression is deterministic, and order keys
  *     are atomic types (interpreted-ordering-safe);
  *   - the plan is batch (streaming aggregates have different semantics).
  *
  * Ties beyond the order keys keep window semantics: both forms pick an
  * arbitrary survivor, so only nondeterministic queries can differ — same
  * contract as the window it replaces.
  */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private val enabledKey = "spark.graft.topkRewrite.enabled"
  private val maxKKey = "spark.graft.topkRewrite.maxK"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "false").toBoolean) return plan
    val maxK = conf.getConfString(maxKKey, "1000").toInt
    plan.transformUp {
      case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(
            WindowExpression(_: RowNumber,
              WindowSpecDefinition(partSpec, orderSpec,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
            _)), _, _, child, _))
          if !child.isStreaming &&
            orderSpec.nonEmpty &&
            orderSpec.forall(so => so.child.deterministic &&
              org.apache.spark.sql.catalyst.expressions.RowOrdering
                .isOrderable(so.child.dataType)) &&
            partSpec.forall(_.deterministic) =>
        extractK(cond, alias.toAttribute) match {
          case Some(k) if k >= 1 && k <= maxK =>
            // absorb the WindowGroupLimit Spark's InferWindowGroupLimit
            // inserted from the SAME rn-filter: it keeps every row with
            // ranklike ≤ limit — a superset of the row_number top-k the
            // aggregate selects (ranklike ≤ row_number), so dropping it is
            // semantics-preserving and removes its per-partition sort
            val base = child match {
              case WindowGroupLimit(p, o, _, limit, inner)
                if limit >= k && p.length == partSpec.length &&
                  p.zip(partSpec).forall { case (a, b) => a.semanticEquals(b) } &&
                  o.length == orderSpec.length &&
                  o.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } =>
                inner
              case other => other
            }
            rewrite(alias, partSpec, orderSpec, base, k)
          case _ => f
        }
    }
  }

  /** k from `rn <= k` / `rn < k` / `k >= rn` / `k > rn`, all literal-int. */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }

  private def rewrite(rnAlias: Alias, partSpec: Seq[Expression],
                      orderSpec: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
                      child: LogicalPlan, k: Int): LogicalPlan = {
    val rowStruct = CreateStruct(child.output)
    val rowType = rowStruct.dataType.asInstanceOf[StructType]
    val aggFn = TopKRows(orderSpec, rowStruct, k).toAggregateExpression()
    val topkAlias = Alias(aggFn, "__graft_topk")()
    val agg = Aggregate(partSpec, Seq(topkAlias), child)
    val posAttr = AttributeReference("__graft_pos", IntegerType,
      nullable = false)()
    val colAttr = AttributeReference("__graft_row", rowType,
      nullable = false)()
    val gen = Generate(PosExplode(topkAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, colAttr), agg)
    val restored = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(colAttr, i, Some(a.name)), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rn = Alias(Add(posAttr, Literal(1)), rnAlias.name)(
      exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
    Project(restored :+ rn, gen)
  }
}
