package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document robust-winnowing selection (the MOSS scheme) as ONE
  * native expression: word 3-gram md5 hashes, position packing, the
  * sliding-window-of-`w` minimum, and the consecutive-duplicate
  * collapse, fused into a single per-row loop. Returns the array of
  * selected packed prints `hash·2²⁰ + pos0`.
  *
  * This is [[HexPrefixLong]]'s rationale one level up. The value-
  * identical SQL spelling —
  * `array_distinct(transform(sequence(1, greatest(p-w+1, 1)),
  * s -> array_min(slice(packed, s, w))))` over
  * `packed = transform(..., i -> hex_prefix_long(md5(shingle),1)·2²⁰ +
  * (i-1))` — evaluates every md5 inside a higher-order-function lambda,
  * which Spark runs INTERPRETED per element (HOFs don't participate in
  * codegen); measured 2.5-3.0 s for the packed projection alone at the
  * 50× corpus. Here the whole selection is one static Java call per
  * ROW from inside whole-stage codegen.
  *
  * Value identity with the SQL chain, piece by piece:
  *   - shingle bytes = UTF-8 of `concat_ws(' ', slice(w, i, 3))`
  *     (tokens joined by 0x20 — tokens are pre-split, never contain a
  *     space);
  *   - hash = first 8 md5 hex digits as a long = the first 4 digest
  *     bytes read big-endian unsigned (what `hex_prefix_long(h, 1)`
  *     folds);
  *   - window s covers packed[s-1 .. s+w-2] truncated at the array end
  *     (`slice` semantics = the old rowsBetween frame at the partition
  *     edge); starts run 1..max(p-w+1, 1), so a doc with fewer than w
  *     shingles keeps its single truncated window;
  *   - a given packed value can only win in the contiguous run of
  *     windows containing its position, so duplicates in the min
  *     sequence are ADJACENT — collapsing "same as previous" is exactly
  *     `array_distinct` (order of survivors is first-occurrence in both
  *     spellings).
  *
  * NULL contract: null tokens array → null (nullSafeEval); the shingle
  * count cap 2²⁰ documented at [[graft.operators.TextAnalysis.winnowReport]]
  * holds here identically (positions pack into the low 20 bits).
  *
  * `w` must be a foldable positive integer — a structural parameter,
  * like [[HexPrefixLong]]'s start offset.
  */
case class WinnowPrints(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        // Structural parameter: enforce the documented positivity at
        // analysis time (w=0 would read packed(p) out of bounds
        // executor-side).
        right.eval() match {
          case w: java.lang.Integer if w > 0 => TypeCheckResult.TypeCheckSuccess
          case v => TypeCheckResult.TypeCheckFailure(
            s"winnow_prints requires w to be a positive int literal, got $v")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        "winnow_prints expects (array<string> tokens, foldable int w), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  override protected def nullSafeEval(toks: Any, wv: Any): Any =
    WinnowPrints.compute(toks.asInstanceOf[ArrayData],
      wv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = WinnowPrints.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (t, w) => s"$cls.compute($t, $w)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WinnowPrints = copy(newLeft, newRight)
}

object WinnowPrints {
  /** One digest per executor thread, not per row — see the identical
    * note at [[MinKHexHashes.Md5]]; this loop runs per document on the
    * q113 hot path.
    */
  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One fused pass; public static for the generated code. Fewer than
    * 3 tokens → empty array (the caller's `size(w) >= 3` filter makes
    * it unreachable on the gated path, but the value is still
    * well-defined).
    */
  def compute(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val p = n - 2
    if (p <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = Md5.get()
    val packed = new Array[Long](p)
    var i = 0
    while (i < p) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      md.update(' '.toByte)
      md.update(toks.getUTF8String(i + 1).getBytes)
      md.update(' '.toByte)
      md.update(toks.getUTF8String(i + 2).getBytes)
      val d = md.digest()
      val hash = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      packed(i) = (hash << 20) + i
      i += 1
    }
    val starts = math.max(p - w + 1, 1)
    val out = new Array[Long](starts)
    var m = 0
    var prev = Long.MinValue
    // sliding-window minimum via a monotonic deque of indices (ascending
    // packed values front→back): O(p) total instead of the old O(p·w)
    // nested scan — each index enters and leaves the deque once. Values
    // are distinct (position in the low bits), so strict < suffices.
    val dq = new Array[Int](p)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    var s = 0
    while (s < starts) {
      val end = math.min(s + w, p) // window covers packed[s .. end-1]
      while (j < end) {
        while (tail > head && packed(dq(tail - 1)) > packed(j)) tail -= 1
        dq(tail) = j
        tail += 1
        j += 1
      }
      while (dq(head) < s) head += 1 // expire indices left of the window
      val mn = packed(dq(head))
      if (mn != prev) { out(m) = mn; m += 1; prev = mn }
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Column helper: requires [[GraftFunctions.install]] on the session. */
  def apply(tokens: org.apache.spark.sql.Column, w: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("winnow_prints", tokens,
      org.apache.spark.sql.functions.lit(w))
}
