package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `row_number().over(partitionBy ... orderBy ...) as
  * rn` immediately filtered by `rn <= k` (or `= 1` / `< k`) is the
  * universal grouped-top-k idiom — and Spark executes it by fully
  * sorting every partition. This rule replans the idiom onto
  * [[TopKPerKeyPlan]] (bounded heaps + map-side partial), preserving
  * the original attribute ids so downstream operators are untouched.
  *
  * Correctness: for a TOTAL per-partition ordering the kept rows and
  * ranks are identical. For a non-total ordering row_number itself is
  * nondeterministic among ties, so either plan returns one valid
  * answer (same contract Spark's own sort-based implementation has
  * across shuffles/retries).
  *
  * Conservative triggers only: a Window with EXACTLY one window
  * expression (row_number), a Filter directly above it (optionally
  * with extra conjuncts, which are preserved), non-empty partition
  * spec, and a positive literal bound.
  *
  * Gated on `spark.graft.rewrite.topk` (default true) — a session-wide
  * replan of user SQL should always be opt-out-able; the gate is also
  * what lets the bench time the window baseline honestly.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewrite.topk"

  private def boundOf(cond: Expression, rn: Attribute): Option[(Int, Seq[Expression])] = {
    val conjuncts = splitConjuncts(cond)
    val (bounds, rest) = conjuncts.partition {
      case LessThanOrEqual(a: Attribute, Literal(_: Int, IntegerType)) => a.exprId == rn.exprId
      case LessThan(a: Attribute, Literal(_: Int, IntegerType)) => a.exprId == rn.exprId
      case EqualTo(a: Attribute, Literal(_: Int, IntegerType)) => a.exprId == rn.exprId
      case EqualTo(Literal(_: Int, IntegerType), a: Attribute) => a.exprId == rn.exprId
      case _ => false
    }
    if (bounds.size != 1) None
    else bounds.head match {
      case LessThanOrEqual(_, Literal(k: Int, IntegerType)) if k > 0 => Some((k, rest))
      case LessThan(_, Literal(k: Int, IntegerType)) if k > 1 => Some((k - 1, rest))
      case EqualTo(_, Literal(1, IntegerType)) => Some((1, rest))
      case EqualTo(Literal(1, IntegerType), _) => Some((1, rest))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber,
            WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
        _, _, child, _)) if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      boundOf(cond, rn) match {
        case Some((k, rest)) =>
          val topk = TopKPerKeyPlan(partitionSpec, orderSpec, k, child)
          // re-expose the rank under the original rn attribute id so
          // downstream references keep resolving
          val projected = Project(
            child.output :+ Alias(topk.rankAttr, alias.name)(exprId = alias.exprId),
            topk)
          if (rest.isEmpty) projected
          else Filter(rest.reduce(And), projected)
        case None => f
      }
  }
}
