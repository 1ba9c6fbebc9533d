package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous "latest row per key" idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).filter($"rn" === 1) }}}
  *
  * into a `max_by`/`min_by` aggregation of the whole row. The window form
  * ships EVERY input row across the network and sorts each partition just
  * to keep one row per key; the aggregate form collapses each key to a
  * single row in the map-side partial aggregate BEFORE the exchange, so
  * shuffle volume drops by the per-key fan-in — the dominant cost of this
  * idiom at 100 TB. (The engine's own queries hand-write the aggregate
  * form — see B3Pipeline / WindowQueries; this rule gives the same plan
  * to naive user queries, installed cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions` or per-session
  * through `spark.experimental.extraOptimizations`.)
  *
  * The rewrite fires only when it is provably safe:
  *  - the Window's ONLY window expression is the filtered `row_number()`
  *    (any other window output would be lost);
  *  - the filter keeps exactly rank 1 (`rn = 1`, `rn <= 1`, `rn < 2`)
  *    and nothing else (no other conjuncts);
  *  - all order keys sort in the SAME direction (lexicographic struct
  *    comparison then matches the multi-key sort order);
  *  - every order key is non-nullable (`max_by`/`min_by` skip rows whose
  *    ordering value is null, `row_number` ranks them — semantics would
  *    diverge on null keys).
  *
  * On ties `row_number` keeps an arbitrary row and so does
  * `max_by`/`min_by` — both are deterministic only under a total order,
  * so the rewrite preserves every guarantee the input plan actually had.
  */
object TopOneToMaxBy extends Rule[LogicalPlan] {

  /** cond ≡ "attr ranks first"? */
  private def keepsRankOne(cond: Expression, rn: Attribute): Boolean =
    cond match {
      case EqualTo(a: Attribute, IntegerLiteral(1)) => a.semanticEquals(rn)
      case EqualTo(IntegerLiteral(1), a: Attribute) => a.semanticEquals(rn)
      case LessThanOrEqual(a: Attribute, IntegerLiteral(1)) =>
        a.semanticEquals(rn)
      case LessThan(a: Attribute, IntegerLiteral(2)) => a.semanticEquals(rn)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partSpec, orderSpec, windowChild, _))
        if keepsRankOne(cond, alias.toAttribute) &&
          orderSpec.nonEmpty &&
          orderSpec.map(_.direction).distinct.size == 1 &&
          orderSpec.forall(o => !o.child.nullable) =>
      // InferWindowGroupLimit may already have inserted a per-partition
      // top-1 prefilter below the Window; the aggregate subsumes it.
      val child = windowChild match {
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case other => other
      }
      val rowStruct = CreateStruct(child.output)
      val orderKey =
        if (orderSpec.size == 1) orderSpec.head.child
        else CreateStruct(orderSpec.map(_.child))
      val pick = orderSpec.head.direction match {
        case Ascending => MinBy(rowStruct, orderKey)
        case Descending => MaxBy(rowStruct, orderKey)
      }
      val pickAlias = Alias(pick.toAggregateExpression(), "__top1_row")()
      val agg = Aggregate(partSpec, Seq(pickAlias), child)
      // An UNGROUPED aggregate over empty input still emits one row
      // (max_by = null) where the original Window+Filter emits none, so
      // the global-top-1 case must drop the null sentinel row; grouped
      // aggregates emit zero rows on empty input, no filter needed.
      val aggOrFiltered =
        if (partSpec.isEmpty) Filter(IsNotNull(pickAlias.toAttribute), agg)
        else agg
      // Re-expose the original output attributes (same exprIds, so parent
      // operators' references stay valid): each child column extracted
      // from the picked row struct, and the rank column as literal 1.
      val fields = child.output.zipWithIndex.map { case (attr, i) =>
        Alias(GetStructField(pickAlias.toAttribute, i, Some(attr.name)),
          attr.name)(exprId = attr.exprId)
      }
      val rn = Alias(Literal(1), alias.name)(exprId = alias.exprId)
      Project(fields :+ rn, aggOrFiltered)
  }
}
