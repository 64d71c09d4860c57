package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Greatest,
  GreaterThan, GreaterThanOrEqual, Least, Length, Literal, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.JaroWinklerSim

/** Length-ratio pruning for Jaro-Winkler threshold filters — the classic
  * entity-resolution rewrite, injected as an optimizer `Rule[LogicalPlan]`
  * (the one place the engine uses the rule tier of
  * SparkSessionExtensions; everything else is expressible as functions).
  *
  * For `jaro_winkler(a, b) >= t` with t > 0.8, a cheap length conjunct is
  * PROVABLY implied:
  *
  *   Jaro j = (m/n1 + m/n2 + (m − τ/2)/m) / 3 with m ≤ min(n1, n2), so
  *   j ≤ (min/max + 2) / 3. The Winkler boost adds at most ℓ·0.1·(1−j)
  *   with ℓ ≤ 4, so jw ≤ 0.6·j + 0.4 (and when no boost applies,
  *   jw = j ≤ 0.6·j + 0.4 since j ≤ 1). Therefore
  *
  *     jw ≥ t  ⟹  0.6·(min/max + 2)/3 + 0.4 ≥ t  ⟹  min/max ≥ 5t − 4.
  *
  * The bound is vacuous at t ≤ 0.8 (5t − 4 ≤ 0), so the rule fires only
  * above it — e.g. t = 0.95 prunes every candidate pair whose shorter
  * name is under 75% of the longer one before the O(n²) scoring runs.
  *
  * Null semantics are preserved: if either side is null the added
  * conjunct is null, and the original `jw >= t` conjunct was already
  * null — the row was filtered either way.
  *
  * Fixed-point safe: the conjunct is only added when no semantically
  * equal conjunct is already present, so repeated optimizer passes leave
  * the plan unchanged.
  */
object JaroWinklerLengthPruning extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def lengthBound(a: Expression, b: Expression, t: Double): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    GreaterThanOrEqual(Least(Seq(la, lb)),
      Multiply(Literal(5.0 * t - 4.0), Greatest(Seq(la, lb))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val additions = existing.flatMap {
        case GreaterThanOrEqual(jw: JaroWinklerSim, Literal(t: Double, DoubleType))
            if t > 0.8 =>
          Some(lengthBound(jw.left, jw.right, t))
        case GreaterThan(jw: JaroWinklerSim, Literal(t: Double, DoubleType))
            if t >= 0.8 =>
          Some(lengthBound(jw.left, jw.right, t))
        case _ => None
      }.filterNot(p => existing.exists(_.semanticEquals(p)))
      if (additions.isEmpty) f
      // Cheap bound first: whole-stage codegen short-circuits the And,
      // skipping the O(n²) scorer for pruned pairs.
      else Filter(additions.foldRight(cond)(And(_, _)), child)
  }
}
