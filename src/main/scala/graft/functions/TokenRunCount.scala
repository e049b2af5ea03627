package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of BPE-ish subword tokens — the native, single-byte-loop form
  * of `regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')`, the
  * per-row hot path of [[graft.operators.TextAnalysis.stats]] (q36) and
  * [[graft.operators.TextAnalysis.tokenizerFertility]] (q126).
  *
  * `java.util.regex` pays NFA bookkeeping per character on a pattern
  * that is structurally a 3-way run classifier; this expression is the
  * classifier itself: one pass over the UTF-8 bytes, a 2-bit run state,
  * no allocation, fully inside whole-stage codegen. Counting rules,
  * exactly the leftmost-first alternation semantics of the pattern on
  * lowered text:
  *
  *   - a maximal run of ASCII letters (case-folded: `A-Z` counts as
  *     `a-z`, which is what the wrapping `lower(text)` did) counts 1;
  *   - a maximal run of ASCII digits counts 1 (a digit run breaks a
  *     letter run and vice versa, as the alternation does);
  *   - ASCII whitespace — explicitly `[ \t\n\x0B\f\r]`, the exact set
  *     `java.util.regex` means by `\s` (NB `\x0B` vertical tab, which
  *     RE2-family engines exclude from `\s`; the oracle-facing contract
  *     is ASCII text without vertical tabs, as documented at the q126
  *     call site) — matches nothing and breaks any run;
  *   - every other ASCII byte (punctuation) counts 1 alone;
  *   - every non-ASCII code point counts 1 alone (a UTF-8 lead byte
  *     counts, its continuation bytes don't), matching the regex on
  *     a non-ASCII char: never `a-z`/`0-9`/`\s`, so a standalone
  *     `[^a-z0-9\s]` match that breaks runs —
  *   - EXCEPT the two code points whose full lowercase involves an
  *     ASCII letter, handled to match `lower()` exactly (so the
  *     [[graft.plans.NativeSubstitutionRule]] rewrite of the regex
  *     spelling is sound for every input, not just ASCII): U+212A
  *     KELVIN SIGN lowers to `k` and so joins/extends a letter run;
  *     U+0130 İ lowers to `i` + U+0307 COMBINING DOT ABOVE, i.e. a
  *     letter that joins/starts a run immediately followed by a
  *     standalone mark that breaks it (`"aİb"` → `ai̇b` → 3 tokens:
  *     `ai`, the dot, `b`). Property-pinned against the regex
  *     spelling over a generator that includes both code points
  *     (NativeExprPropertySpec).
  *
  * Locale note: `lower()` (Spark's `UTF8String.toLowerCase`, which
  * defers to Java's default-locale `String.toLowerCase`) assumes a
  * non-Turkish/Azeri JVM locale — under `tr`/`az`, plain ASCII `I`
  * lowers to dotless `ı` and the regex spelling itself changes
  * meaning. This expression implements the root-locale semantics,
  * the only one a distributed engine can sanely pin (executors with
  * heterogeneous default locales would otherwise disagree with each
  * other, never mind with this classifier).
  */
case class TokenRunCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_run_count expects a string, got ${other.sql}")
    }

  override protected def nullSafeEval(s: Any): Any =
    TokenRunCount.count(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = TokenRunCount.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$cls.count($s.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenRunCount = copy(newChild)
}

object TokenRunCount {
  /** One pass, 2-bit state: 0 = no run, 1 = in letter run, 2 = in
    * digit run. Public static for the generated code.
    */
  def count(bytes: Array[Byte]): Long = {
    var c = 0L
    var state = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) {
        if (state != 1) c += 1
        state = 1
      } else if (b >= '0' && b <= '9') {
        if (state != 2) c += 1
        state = 2
      } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r') {
        state = 0
      } else if (b == 0xE2.toByte && i + 2 < n &&
          bytes(i + 1) == 0x84.toByte && bytes(i + 2) == 0xAA.toByte) {
        // U+212A KELVIN SIGN: lower() folds it to 'k' — a letter that
        // joins/extends the current run; consume all three bytes here
        if (state != 1) c += 1
        state = 1
        i += 2
      } else if (b == 0xC4.toByte && i + 1 < n &&
          bytes(i + 1) == 0xB0.toByte) {
        // U+0130 İ: lower() expands it to 'i' + U+0307 — a letter
        // (joins/starts a run) immediately followed by a standalone
        // combining-mark token that breaks the run
        if (state != 1) c += 1
        c += 1
        state = 0
        i += 1
      } else if ((b & 0xC0) == 0x80) {
        // UTF-8 continuation byte: its lead byte already counted
        state = 0
      } else {
        // ASCII punctuation or a UTF-8 lead byte: standalone match
        c += 1
        state = 0
      }
      i += 1
    }
    c
  }

  /** Column helper: requires [[GraftFunctions.install]] on the session. */
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("token_run_count", text)
}
