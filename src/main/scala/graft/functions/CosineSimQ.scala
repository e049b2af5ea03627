package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pico-quantized cosine similarity as a native Catalyst expression with
  * whole-stage codegen — the hot inner loop of the similarity-search
  * operators (`graft.operators.Similarity`).
  *
  * Semantics are EXACTLY the portable formula the DuckDB oracle replays
  * (see Similarity's scaladoc): per-element products quantized via
  * `floor(x*y*1e12 + 0.5)` longs, summed, one double division chain at
  * the end — so swapping this in for the higher-order-function
  * formulation changes performance only, never results.
  *
  * Why an Expression and not the `aggregate(zip_with(...))` HOF chain:
  * the HOF path allocates intermediate arrays and evaluates a lambda
  * per element per pair (3 passes: dot + both norms); this compiles to
  * one fused primitive loop inside whole-stage codegen — the difference
  * between O(k·n) interpreted closures and a tight long-accumulator
  * loop when brute-forcing |Q|·N pairs.
  *
  * Accepts float and double arrays on either side (the IVF centroid is
  * ARRAY<DOUBLE>, raw embeddings ARRAY<FLOAT>) WITHOUT inserting an
  * array cast — a double→float cast would perturb the quantized values
  * vs the oracle.
  */
case class CosineSimQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"cosine_sim_q expects array<float|double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim_q expects array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    // mismatched dimensionality is malformed input: surface as NULL
    // rather than a plausible-looking truncated similarity
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      dot += math.floor(xi * yi * 1e12 + 0.5).toLong
      nx += math.floor(xi * xi * 1e12 + 0.5).toLong
      ny += math.floor(yi * yi * 1e12 + 0.5).toLong
      i += 1
    }
    (dot.toDouble / 1e12) /
      (math.sqrt(nx.toDouble / 1e12) * math.sqrt(ny.toDouble / 1e12))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.$lGet($i);
         |    double $yi = (double) $y.$rGet($i);
         |    $dot += (long) Math.floor($xi * $yi * 1e12 + 0.5);
         |    $nx += (long) Math.floor($xi * $xi * 1e12 + 0.5);
         |    $ny += (long) Math.floor($yi * $yi * 1e12 + 0.5);
         |  }
         |  ${ev.value} = ($dot / 1e12) /
         |    (Math.sqrt($nx / 1e12) * Math.sqrt($ny / 1e12));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimQ = copy(newLeft, newRight)
}

object GraftFunctions {
  /** Idempotently register the graft native expressions in the
    * session's FunctionRegistry; callers then use the public
    * `functions.call_function("cosine_sim_q", …)` Column API.
    */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_q",
      exprs => CosineSimQ(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hex_prefix_long",
      exprs => HexPrefixLong(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_run_count",
      exprs => TokenRunCount(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_prints",
      exprs => WinnowPrints(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_run_count",
      exprs => WordRunCount(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_k_hex_hashes",
      exprs => MinKHexHashes(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_cuts",
      exprs => CdcCuts(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ks_distance_ppm",
      exprs => KsDistancePpm(exprs(0), exprs(1)),
      "built-in")
    ()
  }
}
