package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, PredicateHelper, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Orders conjunctive filter predicates so UDF-bearing conjuncts (the
  * AI functions — each call is model-inference priced) evaluate AFTER
  * the cheap native ones, letting short-circuit evaluation skip the
  * expensive call for rows a cheap predicate already rejects.
  *
  * The reference enforces this by construction (cheap file/class
  * filters always sit under the AI projection — SURVEY §4 item 1); the
  * rule makes the guarantee structural for user-authored filters like
  *   ai_classify(text) === "invoice" && doc_id < 100
  * where Catalyst preserves the written order.
  *
  * Safety: conjunct reordering needs every conjunct deterministic
  * (checked); with that, AND is commutative in SQL three-valued logic,
  * and Spark's own pushdown rules already reorder deterministic
  * conjuncts freely. The sort is stable, so relative order within the
  * cheap and expensive classes is preserved.
  */
object CheapPredicatesFirst extends Rule[LogicalPlan] with PredicateHelper {

  private def hasUdf(e: Expression): Boolean = e.exists(_.isInstanceOf[ScalaUDF])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if cond.deterministic && cond.isInstanceOf[And] && hasUdf(cond) =>
      val preds = splitConjunctivePredicates(cond)
      val sorted = preds.sortBy(p => if (hasUdf(p)) 1 else 0)
      if (sorted == preds) f else Filter(sorted.reduce(And), child)
  }
}
