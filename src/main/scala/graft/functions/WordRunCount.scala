package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-word count — the native form of
  * `size(filter(split(lower(text), ' '), t -> t <> ''))`
  * ([[graft.operators.Dedup.tokens]]'s length), for the operators that
  * need only the COUNT and not the array (tokenizer fertility's
  * words-per-doc, source-mixture token mass). The split is on the
  * single space character, so the count is exactly the number of
  * maximal runs of non-space bytes: one pass, one comparison per byte,
  * no array materialization, no interpreted lambda. UTF-8-safe for
  * free (no multi-byte sequence contains 0x20), and `lower()` never
  * changes the count, so the wrapping lower is dropped too.
  */
case class WordRunCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_run_count expects a string, got ${other.sql}")
    }

  override protected def nullSafeEval(s: Any): Any =
    WordRunCount.count(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = WordRunCount.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$cls.count($s.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordRunCount = copy(newChild)
}

object WordRunCount {
  /** Runs of non-space bytes. Public static for the generated code. */
  def count(bytes: Array[Byte]): Long = {
    var c = 0L
    var in = false
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (bytes(i) == ' ') in = false
      else { if (!in) c += 1; in = true }
      i += 1
    }
    c
  }

  /** Column helper: requires [[GraftFunctions.install]] on the session. */
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("word_run_count", text)
}
