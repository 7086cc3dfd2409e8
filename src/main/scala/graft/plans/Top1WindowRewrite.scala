package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: top-1-per-group via ROW_NUMBER → sort-free argmax.
  *
  * `ROW_NUMBER() OVER (PARTITION BY p ORDER BY k) ... WHERE rn = 1` is
  * the reference's ranking idiom (W1,
  * /root/reference/dags/report/cheap_expensive_chart.py:62-68) and the
  * single most common window anti-pattern at scale: the window plans an
  * exchange PLUS a per-partition SORT of the full input, to keep one
  * row per group. The winner of that ordering is just
  * `min_by(row, ordering-key)` — a partial-aggregable hash aggregate:
  * map-side combine collapses each partition to ≤1 row per group
  * before the exchange, and nothing ever sorts. (Spark's own
  * InferWindowGroupLimit, which runs in a later batch, only prunes each
  * partition to its top row — it still pays the window's shuffle+sort
  * to produce it.)
  *
  * Semantics: value-identical to the window form whenever the ordering
  * is total per group (ties under a non-total ordering are
  * nondeterministic in BOTH forms, so the rewrite stays
  * semantics-preserving). Null ordering is preserved exactly: the
  * ordering keys ride inside a struct — the struct itself is never
  * null, so min_by/max_by's null-skipping never engages, and struct
  * field comparison is nulls-first ascending, which is precisely
  * ASC NULLS FIRST (and, mirrored under max_by, DESC NULLS LAST — the
  * two Spark defaults). Non-default null orderings and mixed
  * ASC/DESC keys don't match the struct ordering and are left alone.
  *
  * Fires on: Filter(rn = 1 [AND rest], Window(Seq(rn := row_number()),
  * p, o, child)) with all-ASC-nulls-first or all-DESC-nulls-last order.
  * Rewrites to: Filter(rest, Project(fields of argmax struct + rn := 1,
  * Aggregate(p, min_by/max_by(struct(child.output), struct(o)), child)))
  * with every output attribute keeping its original exprId, so
  * downstream references are untouched.
  */
object Top1WindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      matchTop1(cond, w).getOrElse(f)
  }

  private def matchTop1(cond: Expression, w: Window): Option[LogicalPlan] = {
    // exactly one window expression: rn := row_number() with the
    // standard (UnboundedPreceding, CurrentRow) row frame
    val rnAlias = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
          UnboundedPreceding, CurrentRow))), _)) => a
      case _ => return None
    }
    val rnAttr = rnAlias.toAttribute

    // the filter must pin rn to 1; other conjuncts stay above
    val (top1, rest) = splitConjunctivePredicates(cond).partition {
      case EqualTo(a: AttributeReference, Literal(1, _)) => a.semanticEquals(rnAttr)
      case EqualTo(Literal(1, _), a: AttributeReference) => a.semanticEquals(rnAttr)
      case LessThanOrEqual(a: AttributeReference, Literal(1, _)) => a.semanticEquals(rnAttr)
      case _ => false
    }
    if (top1.isEmpty) return None
    // `rest` must not also reference rn in some other way
    if (rest.exists(_.references.contains(rnAttr))) return None

    // ordering must be uniformly one of Spark's two defaults, so the
    // struct's field-by-field nulls-first ascending comparison (or its
    // mirror under max_by) reproduces it exactly
    val os = w.orderSpec
    if (os.isEmpty) return None
    val allAsc = os.forall(s => s.direction == Ascending && s.nullOrdering == NullsFirst)
    val allDesc = os.forall(s => s.direction == Descending && s.nullOrdering == NullsLast)
    if (!allAsc && !allDesc) return None
    // grouping/ordering by a nondeterministic expression would make the
    // rewritten Aggregate illegal (and the window was ill-defined
    // anyway) — leave such plans alone
    if (!w.partitionSpec.forall(_.deterministic) || !os.forall(_.child.deterministic))
      return None

    val child = w.child
    val rowStruct = CreateStruct(child.output)
    val ordStruct = CreateStruct(os.map(_.child))
    val aggFn = if (allAsc) MinBy(rowStruct, ordStruct) else MaxBy(rowStruct, ordStruct)
    val topAlias = Alias(
      AggregateExpression(aggFn, Complete, isDistinct = false), "_top1")()

    val agg = Aggregate(w.partitionSpec, Seq(topAlias), child)
    // a GLOBAL aggregate over an empty input produces one all-null row,
    // where the window form produces zero — drop it. (With grouping
    // keys, empty input means zero groups and no filter is needed; the
    // min_by struct can only be null on the empty-global case, because
    // its value/ordering structs are themselves never null.)
    val aggOrFiltered: LogicalPlan =
      if (w.partitionSpec.isEmpty) Filter(IsNotNull(topAlias.toAttribute), agg)
      else agg
    // The aliases keep the ORIGINAL attributes' exprIds, so operators
    // above still hold AttributeReference copies with the original
    // nullability. A bare GetStructField over the (nullable) min_by
    // result is nullable — a latent mismatch for downstream rules when
    // the original attribute was not. Non-null is sound here: with
    // grouping keys every group holds ≥1 row so the argmax struct is
    // never null, and the global case sits above the IsNotNull filter —
    // so a non-nullable original's field is provably non-null, and
    // KnownNotNull records that fact for the optimizer (no runtime
    // check, unlike AssertNotNull).
    val fields = child.output.zipWithIndex.map { case (a, i) =>
      val field = GetStructField(topAlias.toAttribute, i, Some(a.name))
      val withNullability = if (a.nullable) field else KnownNotNull(field)
      Alias(withNullability, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnOut = Alias(Literal(1), rnAlias.name)(
      exprId = rnAttr.exprId, qualifier = rnAttr.qualifier)
    val project: LogicalPlan = Project(fields :+ rnOut, aggOrFiltered)
    Some(if (rest.isEmpty) project else Filter(rest.reduce(And), project))
  }
}
