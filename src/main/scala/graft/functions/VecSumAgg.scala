package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group element-wise vector sum (micro-quantized) as a typed
  * Aggregator: input = one embedding (float array), buffer/output =
  * per-dimension sums of `floor(x·1e6 + 0.5)` as exact longs plus the
  * row count.
  *
  * Replaces the `posexplode → groupBy(label, dim)` formulation of
  * centroid computation: the explode materializes |corpus|·d rows and
  * shuffles them on (label, dim), while this aggregator folds each
  * vector into a reused d-long buffer so the shuffle carries ONE
  * buffer per (partition, label) — the same shape win as
  * [[SimHashAgg]] (which replaced a 64× token explode). The per-row
  * arithmetic (`(double) x · 1e6 + 0.5 → floor → long`) is the
  * identical IEEE sequence the SQL spelling uses, and integer sums
  * are merge-order-insensitive, so centroids are bit-identical to the
  * explode formulation at any parallelism (gates q91/q100 pin it
  * against the DuckDB explode oracle).
  *
  * The buffer sizes itself from the first vector (dimension-agnostic);
  * merging an empty buffer is the identity.
  */
case class VecSum(sums: Array[Long], n: Long)

object VecSumAgg extends Aggregator[Array[Float], VecSum, VecSum] {

  override def zero: VecSum = VecSum(Array.emptyLongArray, 0L)

  override def reduce(b: VecSum, v: Array[Float]): VecSum = {
    val s = if (b.sums.length == 0) new Array[Long](v.length) else b.sums
    var i = 0
    while (i < v.length) {
      s(i) += math.floor(v(i).toDouble * 1000000d + 0.5).toLong
      i += 1
    }
    VecSum(s, b.n + 1)
  }

  override def merge(a: VecSum, b: VecSum): VecSum =
    if (a.sums.length == 0) b
    else if (b.sums.length == 0) a
    else {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      VecSum(a.sums, a.n + b.n)
    }

  override def finish(r: VecSum): VecSum = r

  override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]

  override def outputEncoder: Encoder[VecSum] = Encoders.product[VecSum]
}
