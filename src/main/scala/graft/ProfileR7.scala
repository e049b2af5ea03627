package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev harness for the round-7 perf items (VERDICT r6 next-round #1/#2):
  * q02 and q07 candidate reformulations timed against the committed
  * plans on the 50× replica, with in-harness value-parity checks so a
  * wrong reformulation never reaches the gate.
  *
  * q02 candidate — "subgroup finish": l_discount/l_tax are 2-dp
  * fractions with ≤ 11 × 9 distinct percent values, so grouping by
  * (flag, status, disc_pct, tax_pct) first makes EVERY per-row cost a
  * plain long add (no disc/tax multiplies, no hi/lo split — 3 partials
  * instead of 8) and defers the exact Decimal arithmetic to the ≤ 594
  * subgroup rows of the finishing aggregate. Exactness: subgroup price
  * sums are plain-long-safe to ~8.7e11 rows per subgroup (price cents
  * ≤ ~1.05e7), and the finish multiplies exact subgroup sums by exact
  * ints in Decimal(38,0).
  *
  * q07 candidates — "supplier-first": join lineitem to the ASIA-reduced
  * supplier side BEFORE the orders join, so the orderkey shuffle
  * carries only supplier-ASIA survivors (~1/5 of lineitem) instead of
  * every lineitem row; optionally pre-aggregate revenue per
  * (orderkey, supplier nation) before that shuffle. The judge-suggested
  * per-orderkey pre-agg alone is semantically unavailable: revenue
  * groups by SUPPLIER nation under c_nationkey = s_nationkey, and an
  * order's lineitems carry different suppliers, so rows cannot collapse
  * per orderkey before the supplier join resolves each row's nation.
  *
  * Usage: runMain graft.ProfileR7 [sfDir] [iters]
  */
object ProfileR7 {

  import graft.queries.Q._

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    def t(n: String): DataFrame = Tables(spark, sfDir, n)

    def dec(c: Column): Column = c.cast(DecimalType(38, 0))

    def q02Subgroup: DataFrame = {
      val sub = t("lineitem")
        .where(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          pct(col("l_discount")).as("pd"), pct(col("l_tax")).as("pt"))
        .agg(sum("l_quantity").as("qty"),
          sum(cents(col("l_extendedprice"))).as("pc"),
          count(lit(1)).as("n"))
      sub.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").as("sum_qty"),
          (sum(dec(col("pc"))).cast("double") / 100).as("sum_base_price"),
          (sum(dec(col("pc")) * (lit(100) - col("pd")))
            .cast("double") / 10000).as("sum_disc_price"),
          (sum(dec(col("pc")) * (lit(100) - col("pd"))
            * (lit(100) + col("pt")))
            .cast("double") / 1000000).as("sum_charge"),
          (sum("qty") / sum("n")).as("avg_qty"),
          (sum(dec(col("pc"))).cast("double") / 100 / sum("n"))
            .as("avg_price"),
          sum("n").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    // shared ASIA reduction (identical to the committed q07 plan)
    def asia: DataFrame = t("nation")
      .join(broadcast(t("region").where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    def cust: DataFrame = t("customer")
      .join(broadcast(asia.select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("c_nationkey"))
    def supp: DataFrame = t("supplier")
      .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    def oc: DataFrame = t("orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    def liRev: DataFrame = t("lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (cents(col("l_extendedprice"))
          * (lit(100) - pct(col("l_discount")))).as("rev"))

    def finish(joined: DataFrame): DataFrame = joined
      .groupBy("n_name")
      .agg((exactSum(col("rev")).cast("double") / 10000).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))

    // supplier side joins FIRST (planner broadcasts it at this scale):
    // the orderkey shuffle then carries only supplier-ASIA survivors
    def q07SuppFirst: DataFrame = finish(
      liRev
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(oc, col("l_orderkey") === col("o_orderkey") &&
          col("c_nationkey") === col("s_nationkey")))

    // + pre-aggregate revenue per (orderkey, supplier nation) before
    // the orders join; per-key partials are plain-long-safe (an order's
    // per-nation revenue sum is bounded by its ~7 items × ~1e9)
    def q07SuppFirstPreagg: DataFrame = finish(
      liRev
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_orderkey", "s_nationkey", "n_name")
        .agg(sum("rev").as("rev"))
        .join(oc, col("l_orderkey") === col("o_orderkey") &&
          col("c_nationkey") === col("s_nationkey")))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q02_current" -> (() =>
        SparkEntry.queries("q02_pricing_summary")(spark, sfDir)),
      "q02_subgroup" -> (() => q02Subgroup),
      "q07_current" -> (() =>
        SparkEntry.queries("q07_regional_revenue")(spark, sfDir)),
      "q07_suppfirst" -> (() => q07SuppFirst),
      "q07_suppfirst_preagg" -> (() => q07SuppFirstPreagg))

    // the shared host has multi-minute co-tenant load bursts (the r6
    // environmental finding): interleave variants within a round so a
    // burst hits all of them equally, and gate each round on a quiet
    // 1-minute loadavg so at least some rounds are clean
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def waitForQuiet(threshold: Double = 2.5, maxWaitSec: Int = 420): Double = {
      var waited = 0
      var load = os.getSystemLoadAverage
      while (load > threshold && waited < maxWaitSec) {
        Thread.sleep(15000); waited += 15
        load = os.getSystemLoadAverage
      }
      load
    }
    variants.foreach(_._2().write.mode("overwrite").format("noop").save())
    val results = collection.mutable.Map[String, List[(Double, Double)]]()
      .withDefaultValue(Nil)
    for (round <- 1 to iters) {
      val loadAtStart = waitForQuiet()
      for ((name, mk) <- variants) {
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        results(name) = results(name) :+ (dt, os.getSystemLoadAverage)
        println(f"[r7-round$round] $name%-22s $dt%7.3f" +
          f"  (load start $loadAtStart%.1f now ${os.getSystemLoadAverage}%.1f)")
      }
    }
    for ((name, _) <- variants) {
      val rs = results(name)
      println(f"[r7] $name%-22s best ${rs.map(_._1).min}%7.3f  " +
        rs.map { case (t, l) => f"$t%6.3f@$l%.0f" }.mkString(" "))
    }

    val q02a = SparkEntry.queries("q02_pricing_summary")(spark, sfDir)
      .collect().map(_.toSeq)
    val q02b = q02Subgroup.collect().map(_.toSeq)
    println(s"[r7] q02 values equal: ${q02a.sameElements(q02b)}")
    val q07a = SparkEntry.queries("q07_regional_revenue")(spark, sfDir)
      .collect().map(_.toSeq)
    val q07b = q07SuppFirst.collect().map(_.toSeq)
    val q07c = q07SuppFirstPreagg.collect().map(_.toSeq)
    println(s"[r7] q07 suppfirst values equal: ${q07a.sameElements(q07b)}")
    println(s"[r7] q07 preagg    values equal: ${q07a.sameElements(q07c)}")
    spark.stop()
  }
}
