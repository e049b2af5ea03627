package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{TokenRunCount, WordRunCount}

/** Optimizer rule substituting the engine's codegen'd native counters
  * for their interpreted SQL spellings, so USER-written SQL gets the
  * same hot path the built-in operators use without knowing the
  * functions exist:
  *
  *  - `size(filter(split(lower(x), ' '), t -> t <> ''))` (either
  *    comparison order, with or without the `lower`) →
  *    `CAST(word_run_count(x) AS INT)`. Value-identical for EVERY
  *    input: splitting on the single space counts maximal non-space
  *    runs, no Unicode case mapping produces or consumes U+0020, and
  *    the count is structurally < 2³⁰ (a UTF8String is < 2³¹ bytes),
  *    so the INT cast cannot wrap. The HOF spelling evaluates an
  *    interpreted lambda per element and materializes the array; the
  *    native form is one byte pass inside whole-stage codegen
  *    (measured ~5× on the q130 mixture pass, PERF_NOTES r9).
  *
  *  - `size(regexp_extract_all(lower(x), '[a-z]+|[0-9]+|[^a-z0-9\s]'))`
  *    (the `regexp_count` replacement tree) →
  *    `CAST(token_run_count(x) AS INT)` — OFF by default, enabled by
  *    `spark.graft.substitute.tokenRunCount=true`. Not unconditionally
  *    sound: [[TokenRunCount]]'s case fold is deliberately ASCII-only,
  *    so U+212A (KELVIN) and U+0130 (İ) — the only two code points
  *    whose full lowercase is an ASCII letter — count as standalone
  *    marks instead of joining a letter run. Corpora that can carry
  *    those two code points must keep the flag off; everything else
  *    gets the measured ~9× regex→run-classifier win (q126, r9).
  *
  * Both substitutions are skipped under `legacySizeOfNull` (where
  * `size(NULL)` is -1, not NULL — the natives propagate NULL).
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions` on a stock
  * session; [[graft.GraftSession.local]] wires it automatically).
  * Runs in the user-provided optimizer batch, i.e. AFTER
  * `RuntimeReplaceable` expansion — so `regexp_count` spellings are
  * already in their `size(regexp_extract_all(...))` form when matched.
  */
object NativeSubstitutionRule extends Rule[LogicalPlan] {

  private val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** `t <> ''` in either order over the lambda's own variable. */
  private def isNonEmptyTest(f: Expression, args: Seq[NamedExpression])
      : Boolean = f match {
    case Not(EqualTo(v: NamedLambdaVariable, Literal(s, _)))
      if s != null && s.toString.isEmpty &&
        args.exists(_.exprId == v.exprId) => true
    case Not(EqualTo(Literal(s, _), v: NamedLambdaVariable))
      if s != null && s.toString.isEmpty &&
        args.exists(_.exprId == v.exprId) => true
    case _ => false
  }

  private def stripLower(e: Expression): Expression = e match {
    case Lower(c) => c
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val wordOn =
      conf.getConfString("spark.graft.substitute.wordRunCount", "true")
        .toBoolean
    val tokenOn =
      conf.getConfString("spark.graft.substitute.tokenRunCount", "false")
        .toBoolean
    if (!wordOn && !tokenOn) return plan
    plan.transformAllExpressions {
      // size(filter(split(lower(x), ' '), t -> t <> ''))  [lower optional]
      case Size(ArrayFilter(
            StringSplit(str, Literal(sep, _), Literal(-1, IntegerType)),
            LambdaFunction(f, args, _)), false)
          if wordOn && sep != null && sep.toString == " " &&
            isNonEmptyTest(f, args) =>
        Cast(WordRunCount(stripLower(str)), IntegerType)
      // size(regexp_extract_all(lower(x), BPE_PATTERN[, 0]))
      case Size(RegExpExtractAll(Lower(x), Literal(pat, _),
            Literal(0, IntegerType)), false)
          if tokenOn && pat != null && pat.toString == TokenPattern =>
        Cast(TokenRunCount(x), IntegerType)
    }
  }
}

/** Session-extension entry point: registers
  * [[NativeSubstitutionRule]]. Stock sessions opt in with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => NativeSubstitutionRule)
}
