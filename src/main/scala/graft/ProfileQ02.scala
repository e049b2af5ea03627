package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev decomposition harness for q02's scale-invariant gap (VERDICT r4
  * "What's wrong" #2): times variants of the q02 pipeline that each add
  * one cost component — scan, filter, string group keys, the quantized
  * money arithmetic, and three spellings of the exact 128-bit-safe SUM —
  * so the per-row cost can be attributed instead of guessed.
  *
  * Usage: runMain graft.ProfileQ02 [sfDir] [iters]
  */
object ProfileQ02 {

  import graft.queries.Q.{cents, pct, exactSum}

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    // optional 3rd arg: vectorized parquet reader batch size (default
    // 4096) — the round-7 scan-tuning lever, measured not guessed
    args.lift(2).foreach(n =>
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", n))
    def li: DataFrame = Tables(spark, sfDir, "lineitem")
    def filtered: DataFrame =
      li.where(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
    val price = cents(col("l_extendedprice"))
    val disc = lit(100) - pct(col("l_discount"))
    val tax = lit(100) + pct(col("l_tax"))
    val charge = price * disc * tax

    // exact long sum via hi/lo bit split: per-row ops stay primitive
    // longs (codegen'd); the 128-bit-safe recombination happens once per
    // GROUP. c = (c >> 20) * 2^20 + (c & (2^20-1)) exactly, any sign.
    def splitSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (sum(shiftright(c, 20)).cast(DecimalType(38, 0)) * (1L << 20) +
        sum(c.bitwiseAND(lit((1L << 20) - 1))).cast(DecimalType(38, 0)))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_qty" -> (() => li.agg(sum("l_quantity"))),
      "filter_qty" -> (() => filtered.agg(sum("l_quantity"))),
      "grp_count" -> (() => filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)), sum("l_quantity"))),
      "money_decimal" -> (() => filtered.agg(exactSum(charge))),
      "money_long" -> (() => filtered.agg(sum(charge))), // wraps at real scale
      "money_split" -> (() => filtered.agg(splitSum(charge))),
      "full_q02" -> (() =>
        SparkEntry.queries("q02_pricing_summary")(spark, sfDir)),
      "full_q02_split" -> (() => filtered
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          (splitSum(price).cast("double") / 100).as("sum_base_price"),
          (splitSum(price * disc).cast("double") / 10000).as("sum_disc_price"),
          (splitSum(charge).cast("double") / 1000000).as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (splitSum(price).cast("double") / 100 / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
      // 1-char flags packed into one int group key, strings rebuilt
      // post-agg (6 groups) — isolates the string-key hash-agg cost
      "full_q02_packed" -> (() => filtered
        .groupBy((ascii(col("l_returnflag")) * 256 +
          ascii(col("l_linestatus"))).as("pk"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          (splitSum(price).cast("double") / 100).as("sum_base_price"),
          (splitSum(price * disc).cast("double") / 10000).as("sum_disc_price"),
          (splitSum(charge).cast("double") / 1000000).as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (splitSum(price).cast("double") / 100 / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .select(chr(shiftright(col("pk"), 8)).as("l_returnflag"),
          chr(col("pk").bitwiseAND(lit(255))).as("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("sum_charge"), col("avg_qty"), col("avg_price"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")))

    for ((name, mk) <- variants) {
      mk().write.mode("overwrite").format("noop").save() // warm JIT
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q02] $name%-18s best ${times.min}%7.3f  " +
        times.map(t => f"$t%6.3f").mkString(" "))
    }
    spark.stop()
  }
}
