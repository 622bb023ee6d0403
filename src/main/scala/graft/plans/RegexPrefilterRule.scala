package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Contains, Expression, Literal, RLike}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: single-word regex predicates (`col RLIKE '\bword\b'` —
  * the K5 fulltext-substitute shape, q55) gain a cheap `contains`
  * prefilter: `Contains(col, 'word') AND RLIKE(...)`. `contains` is a
  * codegen'd substring scan an order of magnitude cheaper than regex
  * evaluation, and short-circuits the regex on non-matching rows —
  * exactly the scan-side win that matters when the filter runs over
  * 100 TB of text.
  *
  * Semantics-preserving by construction (`\bword\b` matches ⇒ the literal
  * word occurs). Idempotent: a guard check keeps the rule from re-wrapping
  * on successive fixed-point passes. Registered cluster-wide via
  * `graft.functions.GraftSparkExtensions`, or per-session through
  * `spark.experimental.extraOptimizations`.
  */
object RegexPrefilterRule extends Rule[LogicalPlan] {

  /** Literal regex source of the form \bword\b (word = [A-Za-z0-9_]+). */
  private val WordRegex = """^\\b(\w+)\\b$""".r

  private def wordOf(pattern: UTF8String): Option[String] =
    pattern.toString match {
      case WordRegex(w) => Some(w)
      case _ => None
    }

  private def hasGuard(cond: Expression, left: Expression, word: String): Boolean =
    cond.exists {
      case Contains(l, Literal(w: UTF8String, StringType)) =>
        l.semanticEquals(left) && w.toString == word
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transformUp {
        case r @ RLike(l, Literal(p: UTF8String, StringType)) =>
          wordOf(p) match {
            case Some(word) if !hasGuard(cond, l, word) =>
              And(Contains(l, Literal(UTF8String.fromString(word), StringType)), r)
            case _ => r
          }
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }
}
