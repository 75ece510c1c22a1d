package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: stop threshold filters from re-evaluating their
  * expensive verify kernels.
  *
  * Every similarity family here ends the same way: compute a score in a
  * projection, filter on it, emit it —
  *
  *   `select(..., kernel(a, b) AS score).filter(score >= t)`
  *
  * Catalyst's predicate pushdown substitutes the alias and moves the
  * filter below the projection, leaving
  *
  *   `Project(kernel AS score, Filter(kernel >= t, child))`
  *
  * — the kernel (levenshtein, merge-intersect, cosine, a lambda pipeline)
  * now runs TWICE per surviving row: once in the filter, once in the
  * projection. Measured r14 (the old `Dataset.count()` bench action had
  * hidden the projection side entirely): d9's plan carries two
  * `levenshtein` calls, and the honest re-capture moved every
  * verify-shaped row up by roughly its kernel cost.
  *
  * This rule runs in the user batch (after pushdown has settled) and
  * rewrites the shape to evaluate the kernel ONCE below the filter:
  *
  *   `Project(score := _cse, Filter(_cse >= t, Project(child.* + kernel AS _cse, child)))`
  *
  * Correctness: only subexpressions that appear in BOTH the projection
  * and the filter condition are extracted — the filter already evaluated
  * them on every input row, so hoisting below the filter adds no new
  * evaluation context (same rows, same failure modes) and removes the
  * per-surviving-row re-evaluation. Everything extracted must be
  * deterministic. Cost: old = N_input (filter) + N_pass (project)
  * kernel evaluations; new = N_input — strictly fewer whenever anything
  * passes.
  *
  * "Expensive" = the subtree contains a Levenshtein, a higher-order
  * function (lambda pipelines are interpreted, not codegen'd), or one of
  * graft's native kernels (`graft.functions.*`) — the expression classes
  * whose per-row cost dwarfs an extra column's bookkeeping. Cheap
  * common subexpressions are left alone: the split projection would cost
  * more in plan depth than it saves.
  *
  * Registered with [[ArgmaxRewrite]] via `experimental.extraOptimizations`
  * (Session.get) and `spark.sql.extensions=graft.plans.GraftExtensions`.
  * PlanSpec pins the physical plan to a single kernel occurrence and
  * DedupSpec/oracle rows pin result identity.
  */
object CseFilterProject extends Rule[LogicalPlan] with PredicateHelper {

  /** The expression CLASSES worth de-duplicating across operators. */
  private def isCore(e: Expression): Boolean = e match {
    case _: Levenshtein => true
    case _: HigherOrderFunction => true
    case other => other.getClass.getName.startsWith("graft.")
  }

  /** Maximal deterministic subtrees of `field` that contain an expensive
    * core AND appear (semantically) inside `cond`.
    */
  private def shared(field: Expression, cond: Expression): Seq[Expression] =
    if (field.deterministic && field.exists(isCore) &&
        cond.exists(_.semanticEquals(field))) Seq(field)
    else field.children.flatMap(c => shared(c, cond))

  private def dedupe(es: Seq[Expression]): Seq[Expression] =
    es.foldLeft(Vector.empty[Expression]) { (acc, e) =>
      if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }

  /** `Project(fields', Filter(cond', Project(base.* + kernels, base)))`
    * when `fields` and `cond` share expensive kernels; None otherwise.
    */
  private def rewrite(fields: Seq[NamedExpression], cond: Expression,
                      base: LogicalPlan): Option[LogicalPlan] = {
    val distinctE = dedupe(fields.flatMap {
      case Alias(ae, _) => shared(ae, cond)
      case _ => Seq.empty
    })
    if (distinctE.isEmpty) None
    else {
      val pairs: Seq[(Expression, Alias)] = distinctE.zipWithIndex.map {
        case (e, i) => (e, Alias(e, s"_cse$i")())
      }
      def sub(x: Expression): Expression = x.transformUp {
        case s if pairs.exists(_._1.semanticEquals(s)) =>
          pairs.find(_._1.semanticEquals(s)).get._2.toAttribute
      }
      val lower = Project(base.output ++ pairs.map(_._2), base)
      Some(Project(fields.map(fl => sub(fl).asInstanceOf[NamedExpression]),
        Filter(sub(cond), lower)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Filter shape: the predicate sits directly below the projection
    case p @ Project(fields, Filter(cond, child)) if cond.deterministic =>
      rewrite(fields, cond, child).getOrElse(p)

    // Join shape: pushdown folded the kernel predicate INTO an inner
    // join's condition (`Join ... condition: kernel >= t`) while the
    // projection above recomputes the kernel. Pull the kernel-bearing
    // conjuncts back out as a Filter (inner join + filter ≡ join with
    // condition — equi keys and cheap conjuncts stay on the join), then
    // apply the same single-evaluation split. Kernel evaluations per
    // matched row: was 2 (condition + projection), now 1.
    case p @ Project(fields, j @ Join(l, r, Inner, Some(cond), hint))
        if cond.deterministic =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hot = dedupe(fields.flatMap {
        case Alias(ae, _) =>
          conjuncts.flatMap(c => shared(ae, c))
        case _ => Seq.empty
      })
      if (hot.isEmpty) p
      else {
        val (pulled, kept) = conjuncts.partition(c =>
          hot.exists(h => c.exists(_.semanticEquals(h))))
        if (pulled.isEmpty) p
        else {
          val newJoin = Join(l, r, Inner, kept.reduceOption(And), hint)
          rewrite(fields, pulled.reduce(And), newJoin).getOrElse(p)
        }
      }
  }
}
