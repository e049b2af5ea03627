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

  private def total(h: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = h.numElements()
    while (i < n) { s += h.getStruct(i, 2).getLong(1); i += 1 }
    s
  }

  def ppm(a: ArrayData, b: ArrayData): Long = {
    val na = total(a)
    val nb = total(b)
    if (na == 0L || nb == 0L) return 0L
    val ks: BigInt =
      if (na <= Long.MaxValue / nb) BigInt(mergeLong(a, b, na, nb))
      else mergeBig(a, b, BigInt(na), BigInt(nb))
    (ks * 1000000 / (BigInt(na) * nb)).toLong
  }

  /** max |cum_a·n_b − cum_b·n_a| with long arithmetic (n_a·n_b known
    * to fit int64, and every cum ≤ its n bounds each product by it).
    */
  private def mergeLong(a: ArrayData, b: ArrayData, na: Long,
      nb: Long): Long = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var cuma = 0L
    var cumb = 0L
    var best = 0L
    while (i < la || j < lb) {
      val va = if (i < la) a.getStruct(i, 2).getLong(0) else Long.MaxValue
      val vb = if (j < lb) b.getStruct(j, 2).getLong(0) else Long.MaxValue
      if (va <= vb) { cuma += a.getStruct(i, 2).getLong(1); i += 1 }
      if (vb <= va) { cumb += b.getStruct(j, 2).getLong(1); j += 1 }
      val d = Math.abs(cuma * nb - cumb * na)
      if (d > best) best = d
    }
    best
  }

  /** Same merge in BigInt for corpora where n_a·n_b overflows int64. */
  private def mergeBig(a: ArrayData, b: ArrayData, na: BigInt,
      nb: BigInt): BigInt = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var cuma = 0L
    var cumb = 0L
    var best = BigInt(0)
    while (i < la || j < lb) {
      val va = if (i < la) a.getStruct(i, 2).getLong(0) else Long.MaxValue
      val vb = if (j < lb) b.getStruct(j, 2).getLong(0) else Long.MaxValue
      if (va <= vb) { cuma += a.getStruct(i, 2).getLong(1); i += 1 }
      if (vb <= va) { cumb += b.getStruct(j, 2).getLong(1); j += 1 }
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
