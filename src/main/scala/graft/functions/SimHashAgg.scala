package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a typed Aggregator: input = md5 hex of one token,
  * buffer = 64 signed bit-counters, output = 16-hex-char signature.
  *
  * Replaces the tokens × 64-bit-positions cross join the SQL
  * formulation needs — per token this does 16 hex-digit parses into a
  * reused 64-long buffer, so the shuffle carries one 64-long buffer per
  * document (with map-side partial aggregation) instead of 64× the
  * token rows. The arithmetic is identical to the DuckDB oracle's
  * explode formulation (gate q33 pins it).
  */
object SimHashAgg extends Aggregator[String, Array[Long], String] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], md5hex: String): Array[Long] = {
    var d = 0
    while (d < 16) {
      val v = Character.digit(md5hex.charAt(d), 16)
      var k = 0
      while (k < 4) {
        val bit = (v >> (3 - k)) & 1
        buf(d * 4 + k) += (if (bit == 1) 1L else -1L)
        k += 1
      }
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): String = {
    val sb = new java.lang.StringBuilder(16)
    var d = 0
    while (d < 16) {
      var v = 0
      var k = 0
      while (k < 4) {
        if (buf(d * 4 + k) >= 0) v |= (8 >> k)
        k += 1
      }
      sb.append("0123456789abcdef".charAt(v))
      d += 1
    }
    sb.toString
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
