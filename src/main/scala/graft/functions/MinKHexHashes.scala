package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Min-k document fingerprint (q38) as one native per-row loop: the
  * `k` lexicographically-smallest md5 hex digests of the document's
  * distinct word 3-gram shingles, concatenated ascending — the
  * [[WinnowPrints]] treatment for the min-k sketch. The value is
  * identical to the SQL spelling (distinct shingles → md5 → k smallest
  * by `ORDER BY hash` → sorted concat): hex lexicographic order equals
  * unsigned byte order on the digests, equal digests collapse exactly
  * like the upstream DISTINCT (equal digest ⟺ equal shingle, md5
  * collisions aside), and ties need no breaking because duplicates
  * are collapsed.
  *
  * The r8 formulation exploded every shingle and ran a doc-keyed
  * rank window (full-corpus shuffle + per-doc sort for a ≤k result);
  * measured 2.4× the oracle at 50×. Here: one MessageDigest reused
  * across the row's shingles, a k-slot insertion sort (k is 4), no
  * shuffle at all.
  *
  * Fewer than 3 tokens → NULL (the caller filters those documents out,
  * matching the empty-explode semantics). `k` must be a foldable
  * positive int — a structural parameter.
  */
case class MinKHexHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        // Structural parameter: enforce the documented positivity at
        // analysis time (k=0 would index keep(-1) executor-side).
        right.eval() match {
          case k: java.lang.Integer if k > 0 => TypeCheckResult.TypeCheckSuccess
          case v => TypeCheckResult.TypeCheckFailure(
            s"min_k_hex_hashes requires k to be a positive int literal, got $v")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        "min_k_hex_hashes expects (array<string> tokens, foldable int k), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  override protected def nullSafeEval(toks: Any, kv: Any): Any =
    MinKHexHashes.compute(toks.asInstanceOf[ArrayData],
      kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = MinKHexHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (t, k) => {
      s"""
         |${ev.value} = $cls.compute($t, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinKHexHashes = copy(newLeft, newRight)
}

object MinKHexHashes {
  private val HexChars = "0123456789abcdef".toCharArray

  /** One digest per executor thread, not per row: this loop is one of
    * the two hottest per-row paths in the engine (q38 runs it over
    * every document), and `MessageDigest.getInstance` allocates the
    * provider-lookup machinery each call. `reset()` before each
    * shingle makes reuse across rows safe.
    */
  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Unsigned lexicographic digest compare; 0 only for equal digests. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** Public static for the generated code; returns null for < 3
    * tokens (no shingles — the doc has no fingerprint).
    */
  def compute(toks: ArrayData, k: Int): UTF8String = {
    val n = toks.numElements()
    val p = n - 2
    if (p <= 0) return null
    val md = Md5.get()
    // ≤ k digests kept sorted ascending; insertion sort — k is tiny
    val keep = new Array[Array[Byte]](k)
    var m = 0
    var i = 0
    while (i < p) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      md.update(' '.toByte)
      md.update(toks.getUTF8String(i + 1).getBytes)
      md.update(' '.toByte)
      md.update(toks.getUTF8String(i + 2).getBytes)
      val d = md.digest()
      if (m < k || cmp(d, keep(m - 1)) < 0) {
        // find insertion point; drop exact duplicates (the DISTINCT)
        var pos = 0
        var dup = false
        var j = 0
        while (j < m && !dup) {
          val c = cmp(d, keep(j))
          if (c == 0) dup = true
          else if (c > 0) pos = j + 1
          j += 1
        }
        if (!dup) {
          val last = math.min(m, k - 1)
          var s = last
          while (s > pos) { keep(s) = keep(s - 1); s -= 1 }
          keep(pos) = d
          if (m < k) m += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](m * 32)
    var o = 0
    var r = 0
    while (r < m) {
      val d = keep(r)
      var b = 0
      while (b < 16) {
        out(o) = HexChars((d(b) >> 4) & 0xF).toByte
        out(o + 1) = HexChars(d(b) & 0xF).toByte
        o += 2
        b += 1
      }
      r += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column helper: requires [[GraftFunctions.install]] on the session. */
  def apply(tokens: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("min_k_hex_hashes", tokens,
      org.apache.spark.sql.functions.lit(k))
}
