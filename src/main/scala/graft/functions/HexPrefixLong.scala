package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Base-16 value of 8 hex characters of a string, starting at a 1-based
  * offset — the native form of `Dedup.hexToLongSql`'s generated chain
  * `Σ (instr('0123456789abcdef', substr(h, start+k, 1)) - 1) · 16^(7-k)`.
  *
  * That chain is the per-row hot path of every md5-bucketed operator
  * (MinHash band hashes, winnowing fingerprints, hashed-feature
  * buckets, Bloom probes, shard routing): 8 single-char UTF8String
  * allocations + 8 constant-string scans per value. This expression is
  * one fused loop over the raw bytes inside whole-stage codegen —
  * performance only, never results: for valid lowercase-hex input
  * (every call site feeds `md5(...)` output) the value is bit-identical
  * to the SQL chain, digit-for-digit, including the `instr`-style
  * `-1` contribution for a non-hex character.
  *
  * Contract differences, deliberate and documented: a string shorter
  * than `start+7` chars returns NULL (malformed input surfaced) where
  * the SQL chain would fold empty substrings through `instr`'s
  * empty-match semantics; and a NON-ASCII string returns NULL — the
  * fold indexes bytes, and byte positions diverge from the SQL chain's
  * character positions once any multi-byte char appears, so divergence
  * is surfaced as NULL rather than a silently different number. No
  * internal caller can hit either — md5 output is always 32 ASCII
  * chars.
  *
  * `start` must be a foldable integer (it is a structural parameter,
  * like a column offset — never data-dependent at any call site).
  */
case class HexPrefixLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "hex_prefix_long expects (string, foldable int 1-based start), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  override protected def nullSafeEval(s: Any, st: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val start = st.asInstanceOf[Int] - 1
    // numBytes == numChars ⇔ pure ASCII ⇔ byte index == char index
    if (u.numBytes() != u.numChars()) return null
    if (start < 0 || start + 8 > bytes.length) return null
    var acc = 0L
    var k = 0
    while (k < 8) {
      acc = acc * 16 + HexPrefixLong.digit(bytes(start + k))
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, st) => {
      val bytes = ctx.freshName("bytes")
      val start = ctx.freshName("start")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      val cls = HexPrefixLong.getClass.getName.stripSuffix("$")
      // NB codegen margin hazard: a template line must never BEGIN with
      // '|' after stripMargin — Spark's code-Block composition strips
      // margins again in some embedding contexts (nested projections),
      // silently eating a leading '||' and producing uncompilable Java
      // that falls back to interpreted eval (caught in r9: 348
      // fallbacks across the suite, all this one line).
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $start = $st - 1;
         |if ($s.numBytes() != $s.numChars() ||
         |    $start < 0 || $start + 8 > $bytes.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $k = 0; $k < 8; $k++) {
         |    $acc = $acc * 16L + $cls.digit($bytes[$start + $k]);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HexPrefixLong = copy(newLeft, newRight)
}

object HexPrefixLong {
  /** instr('0123456789abcdef', c) - 1 for a single byte: hex digit
    * value, or -1 for anything else (incl. uppercase). Public static
    * for the generated code.
    */
  def digit(b: Byte): Long = b match {
    case d if d >= '0' && d <= '9' => (d - '0').toLong
    case a if a >= 'a' && a <= 'f' => (a - 'a' + 10).toLong
    case _ => -1L
  }

  /** Column helper: requires [[GraftFunctions.install]] on the session. */
  def apply(h: org.apache.spark.sql.Column, start: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("hex_prefix_long", h,
      org.apache.spark.sql.functions.lit(start))
}
