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
  *     `[^a-z0-9\s]` match that breaks runs.
  *
  * Deliberate contract divergence from `lower(text)` + regex, same
  * spirit as [[HexPrefixLong]]: the case fold is ASCII-only, so the
  * two Unicode characters whose full lowercase IS an ASCII letter
  * (U+212A KELVIN SIGN → k, U+0130 İ → i̇) count here as standalone
  * marks instead of joining a letter run. No call site can observe
  * this on the gated corpora (ASCII text), and at 100 TB the ASCII
  * fold is the behavior a byte-level tokenizer census actually wants.
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
