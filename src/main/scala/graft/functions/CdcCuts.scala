package graft.functions

import java.security.MessageDigest

import scala.collection.mutable.ArrayBuilder

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk cut positions — the boundary pass of a
  * CDC (content-defined chunking) dedup pipeline, as one native
  * per-row loop.
  *
  * A character position `p` (1-based, code points — the unit DuckDB's
  * `substr`/`length` and Spark's `substring`/`length` agree on) is a
  * cut iff `p ≥ w` and the first 8 md5 hex digits of the `w`-char
  * window ending at `p`, read as a base-16 long (exactly what
  * [[HexPrefixLong]] / `Dedup.hexToLongSql` fold), satisfy
  * `value % div == 0`. The document end `L` is always the final cut,
  * so the cut array delimits a complete partition of the text into
  * chunks `(prev, p]` with expected length ≈ `div` chars. Empty text →
  * empty array; null → null.
  *
  * Why content-defined instead of [[TextAnalysis.chunkTokens]]'
  * striding: a strided chunker's windows are OFFSET-addressed, so one
  * inserted banner ("refetched", cookie notice, byline) shifts every
  * downstream window and zeroes the dup signal against the original
  * document. CDC boundaries depend only on local content — after the
  * insertion point's ~`w` chars of churn, boundaries realign and the
  * shared tail hashes identically. That resynchronization is the whole
  * reason rsync/LBFS-style dedup uses content-defined cuts.
  *
  * Value identity with the portable SQL spelling (the q146 oracle):
  * per position `p in [w, L]`, `hexToLong(md5(substr(text, p-w+1, w)))
  * % div = 0` — the window substring's UTF-8 bytes are hashed, and the
  * first 4 digest bytes read big-endian unsigned equal the 8-hex-digit
  * fold. This expression walks the UTF-8 encoding ONCE, keeping a
  * `w`-slot ring of window-start byte offsets, and hashes each window
  * straight from the row's bytes — no per-position substring
  * allocation, no |text|-row explode: the exploded-positions spelling
  * materializes `L` rows per document through a generated projection,
  * this is one static call per row inside whole-stage codegen.
  *
  * 100 TB note: windowed-md5 is the DETERMINISM choice (both engines
  * agree on md5, so the gate can hash-compare), not the throughput
  * ceiling — a production variant swaps the per-window digest for a
  * Gear/Rabin rolling hash (O(1) per position instead of O(w)) by
  * changing only the predicate inside this loop; every downstream
  * census/dedup operator consumes the cut array unchanged.
  *
  * `w` and `div` are foldable positive ints — structural parameters,
  * validated at analysis time (the [[MinKHexHashes]] lesson: reject
  * here, not with an executor-side exception).
  */
case class CdcCuts(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        (second.eval(), third.eval()) match {
          case (w: java.lang.Integer, d: java.lang.Integer)
              if w > 0 && d > 0 => TypeCheckResult.TypeCheckSuccess
          case (w, d) => TypeCheckResult.TypeCheckFailure(
            s"cdc_cuts requires positive int literals (w, div), got ($w, $d)")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        "cdc_cuts expects (string, foldable int w, foldable int div), " +
          s"got (${first.dataType.sql}, ${second.dataType.sql}, " +
          s"${third.dataType.sql})")
    }

  override protected def nullSafeEval(t: Any, wv: Any, dv: Any): Any =
    CdcCuts.compute(t.asInstanceOf[UTF8String],
      wv.asInstanceOf[Int], dv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = CdcCuts.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (t, w, d) => s"$cls.compute($t, $w, $d)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CdcCuts =
    copy(newFirst, newSecond, newThird)
}

object CdcCuts {
  /** One digest per executor thread — see [[MinKHexHashes.Md5]]. */
  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** UTF-8 sequence length from the lead byte (continuation/invalid
    * lead bytes advance 1, matching UTF8String's forgiving walk).
    */
  private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1

  /** One fused pass; public static for the generated code. */
  def compute(u: UTF8String, w: Int, div: Int): ArrayData = {
    val bytes = u.getBytes
    val nb = bytes.length
    val buf = new ArrayBuilder.ofInt
    if (nb == 0) return new GenericArrayData(buf.result())
    val md = Md5.get()
    // ring(k % w) = byte offset where char k (0-based) starts; the
    // window ending at char index c-1 (1-based position c) starts at
    // char c-w, still resident because only w offsets are ever live.
    val ring = new Array[Int](w)
    var off = 0
    var c = 0
    var lastCut = 0
    while (off < nb) {
      ring(c % w) = off
      off += seqLen(bytes(off))
      c += 1
      if (c >= w) {
        val s = ring((c - w) % w)
        md.reset()
        md.update(bytes, s, off - s)
        val d = md.digest()
        val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        if (v % div == 0) { buf += c; lastCut = c }
      }
    }
    if (lastCut != c) buf += c
    new GenericArrayData(buf.result())
  }
}
