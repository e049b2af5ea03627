package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact two-sample Kolmogorov–Smirnov distance in ppm between two
  * value histograms, each an ASCENDING-sorted `array<struct<v:bigint,
  * c:bigint>>` ((value, count) pairs, v unique within an array):
  *
  *   KS_ppm = floor( max_v |cum_a(v)·n_b − cum_b(v)·n_a| · 10⁶
  *                   / (n_a·n_b) )
  *
  * evaluated by a single two-pointer merge over the two sorted arrays
  * — the classic streaming KS join, equal values advancing BOTH
  * cursors before the difference is read (matching a windowed-CDF
  * oracle that cumulates a merged row's two sides together). Totals
  * n_a/n_b are the internal count sums, so the statistic cannot
  * disagree with the inputs.
  *
  * Exactness at any scale: the cross products stay in long arithmetic
  * while n_a·n_b fits int64 (corpora past ~3·10⁹ events per type fall
  * back to BigInt — same value, slower), and the final ppm conversion
  * is always exact integer BigInt multiply-divide (truncating, both
  * operands non-negative, == the oracle's `//`).
  *
  * This is the map-side finisher of the wide-counter KS respelling:
  * per-type histograms come from ONE value-domain-sized aggregate and
  * each type pair costs one in-memory merge — no pair fan-out rows, no
  * per-pair windows, no persist. Evaluated once per type pair
  * (|types|² rows total), so interpreted evaluation (CodegenFallback)
  * is never the hot path.
  */
case class KsDistancePpm(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  private def histType(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fields), _) =>
      fields.length == 2 && fields.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (histType(left.dataType) && histType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ks_distance_ppm expects two array<struct<bigint,bigint>> " +
        s"histograms, got ${left.dataType.sql} / ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KsDistancePpm.ppm(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KsDistancePpm = copy(newLeft, newRight)
}

object KsDistancePpm {

  /** Defensive normalization (r15 ADVICE): the function is registered
    * as a general session SQL function, so ANY caller-built
    * `array<struct<bigint,bigint>>` can arrive — including arrays with
    * null elements or null struct fields, which the raw
    * `getStruct(i).getLong` merge would NPE on (collect_list-built
    * gate histograms never contain them, but the SQL surface does not
    * know that). Copy the (v, c) pairs out once, SKIPPING null
    * elements and entries with a null v or c — a null entry carries no
    * observation, so dropping it is the only count-consistent reading.
    * One small allocation per evaluation, and the function runs once
    * per type pair, never per row — not a hot path.
    */
  private def pairs(h: ArrayData): (Array[Long], Array[Long]) = {
    val n = h.numElements()
    val vs = new Array[Long](n)
    val cs = new Array[Long](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (!h.isNullAt(i)) {
        val st = h.getStruct(i, 2)
        if (st != null && !st.isNullAt(0) && !st.isNullAt(1)) {
          vs(k) = st.getLong(0)
          cs(k) = st.getLong(1)
          k += 1
        }
      }
      i += 1
    }
    if (k == n) (vs, cs) else (vs.take(k), cs.take(k))
  }

  def ppm(a: ArrayData, b: ArrayData): Long = {
    val (va, ca) = pairs(a)
    val (vb, cb) = pairs(b)
    val na = ca.sum
    val nb = cb.sum
    if (na == 0L || nb == 0L) return 0L
    val ks: BigInt =
      if (na <= Long.MaxValue / nb) BigInt(mergeLong(va, ca, vb, cb, na, nb))
      else mergeBig(va, ca, vb, cb, BigInt(na), BigInt(nb))
    (ks * 1000000 / (BigInt(na) * nb)).toLong
  }

  /** max |cum_a·n_b − cum_b·n_a| with long arithmetic (n_a·n_b known
    * to fit int64, and every cum ≤ its n bounds each product by it).
    */
  private def mergeLong(av: Array[Long], ac: Array[Long], bv: Array[Long],
      bc: Array[Long], na: Long, nb: Long): Long = {
    val la = av.length
    val lb = bv.length
    var i = 0
    var j = 0
    var cuma = 0L
    var cumb = 0L
    var best = 0L
    while (i < la || j < lb) {
      // bounds guard on the advance (not just the sentinel): a REAL
      // value equal to Long.MaxValue ties the exhausted side's
      // sentinel and would otherwise index past the end
      val va = if (i < la) av(i) else Long.MaxValue
      val vb = if (j < lb) bv(j) else Long.MaxValue
      if (i < la && va <= vb) { cuma += ac(i); i += 1 }
      if (j < lb && vb <= va) { cumb += bc(j); j += 1 }
      val d = Math.abs(cuma * nb - cumb * na)
      if (d > best) best = d
    }
    best
  }

  /** Same merge in BigInt for corpora where n_a·n_b overflows int64. */
  private def mergeBig(av: Array[Long], ac: Array[Long], bv: Array[Long],
      bc: Array[Long], na: BigInt, nb: BigInt): BigInt = {
    val la = av.length
    val lb = bv.length
    var i = 0
    var j = 0
    var cuma = 0L
    var cumb = 0L
    var best = BigInt(0)
    while (i < la || j < lb) {
      // bounds guard on the advance (not just the sentinel): a REAL
      // value equal to Long.MaxValue ties the exhausted side's
      // sentinel and would otherwise index past the end
      val va = if (i < la) av(i) else Long.MaxValue
      val vb = if (j < lb) bv(j) else Long.MaxValue
      if (i < la && va <= vb) { cuma += ac(i); i += 1 }
      if (j < lb && vb <= va) { cumb += bc(j); j += 1 }
      val d = (BigInt(cuma) * nb - BigInt(cumb) * na).abs
      if (d > best) best = d
    }
    best
  }

  /** Column helper: requires [[GraftFunctions.install]] on the session. */
  def apply(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("ks_distance_ppm", a, b)
}
