package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for the r4 verdict's q03/q22 at-scale gaps: times the
  * committed plan against a candidate reformulation with identical
  * output values, so plan changes are adopted on measurement.
  *
  * Usage: runMain graft.ProfileQ03Q22 [sfDir] [iters]
  */
object ProfileQ03Q22 {

  import graft.queries.Q._

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    def t(n: String): DataFrame = Tables(spark, sfDir, n)

    // q03 candidate: partial-aggregate the fact side by join key BEFORE
    // the join — the shuffle then moves |partkeys| pre-agg rows, not
    // |lineitem| fact rows; per-key partials are plain long sums (each
    // key's cents sum is bounded by its ~30 items), the brand-level
    // finish reuses the 128-bit-safe exactSum.
    def q03Preagg: DataFrame = {
      val perKey = t("lineitem")
        .groupBy("l_partkey")
        .agg(sum("l_quantity").as("pk_qty"),
          sum(cents(col("l_extendedprice"))).as("pk_cents"),
          count(lit(1)).as("pk_n"))
      val p = t("part").select("p_partkey", "p_brand")
      perKey.join(p, perKey("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(sum("pk_qty").as("sum_qty"),
          (exactSum(col("pk_cents")).cast("double") / 100).as("sum_price"),
          sum("pk_n").as("n_items"))
        .orderBy("p_brand")
    }

    // q22 candidate: sessionize via per-group sorted arrays — one hash
    // aggregate instead of exchange + full per-partition sort + Window.
    // n_sessions = 1 + |gaps > 1800| over the sorted per-user seconds;
    // equal-sec ties contribute gap 0 either way, so values match the
    // window formulation exactly.
    def q22Array: DataFrame = {
      val ev = t("events")
      ev.select(col("user_id"), graft.Tables.epochSec(ev).as("sec"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          array_sort(collect_list(col("sec"))).as("secs"))
        .select(col("user_id"),
          (lit(1L) + size(filter(
            zip_with(
              slice(col("secs"), lit(1), size(col("secs")) - 1),
              slice(col("secs"), lit(2), size(col("secs")) - 1),
              (a, b) => b - a > 1800),
            x => x)).cast("long")).as("n_sessions"),
          col("n_events"))
        .orderBy("user_id")
    }

    // q22 candidate: drop event_id from the shuffle and sort — the
    // session count only depends on sec VALUES (equal-sec ties give gap
    // 0 in any order), so the narrower row and 1-column sort key give
    // the same result
    def q22Narrow: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("sec")
      val ev = t("events")
      ev.select(col("user_id"), graft.Tables.epochSec(ev).as("sec"))
        .select(col("user_id"),
          when(lag(col("sec"), 1).over(w).isNull, 1L)
            .when(col("sec") - lag(col("sec"), 1).over(w) > 1800, 1L)
            .otherwise(0L).as("new_session"))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }

    // q07 candidate: push the ASIA semi-reduction (region → nation →
    // customer / supplier) UPSTREAM of the fact joins, so every
    // fact-side shuffle carries only ASIA rows (~1/5) and the
    // c_nation = s_nation equi-condition joins two pre-shrunk sides.
    def q07Semi: DataFrame = {
      val asia = t("nation")
        .join(broadcast(t("region").where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t("customer")
        .join(broadcast(asia.select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = t("supplier")
        .join(broadcast(asia),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val oc = t("orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      t("lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(oc, col("l_orderkey") === col("o_orderkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg((exactSum(cents(col("l_extendedprice"))
            * (lit(100) - pct(col("l_discount"))))
          .cast("double") / 10000).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }

    // same as q07Semi but the per-row revenue cents (one long) project
    // BEFORE the fact shuffle, replacing two shuffled doubles
    def q07SemiEarlyRev: DataFrame = {
      val asia = t("nation")
        .join(broadcast(t("region").where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t("customer")
        .join(broadcast(asia.select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = t("supplier")
        .join(broadcast(asia),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val oc = t("orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      t("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (cents(col("l_extendedprice"))
            * (lit(100) - pct(col("l_discount")))).as("rev"))
        .join(oc, col("l_orderkey") === col("o_orderkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg((exactSum(col("rev")).cast("double") / 10000).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q03_current" -> (() =>
        SparkEntry.queries("q03_join_broadcast_dim")(spark, sfDir)),
      "q03_preagg" -> (() => q03Preagg),
      "q22_current" -> (() =>
        SparkEntry.queries("q22_sessionize")(spark, sfDir)),
      "q22_array" -> (() => q22Array),
      "q22_narrow" -> (() => q22Narrow),
      "q07_current" -> (() =>
        SparkEntry.queries("q07_regional_revenue")(spark, sfDir)),
      "q07_semi" -> (() => q07Semi),
      "q07_semi_earlyrev" -> (() => q07SemiEarlyRev))

    for ((name, mk) <- variants) {
      mk().write.mode("overwrite").format("noop").save() // warm JIT
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pq] $name%-14s best ${times.min}%7.3f  " +
        times.map(x => f"$x%6.3f").mkString(" "))
    }

    // value-parity spot check (hashes are pinned by the gate; this
    // catches a reformulation bug before it ever reaches the gate)
    val a = SparkEntry.queries("q03_join_broadcast_dim")(spark, sfDir)
      .collect().map(_.toSeq)
    val b = q03Preagg.collect().map(_.toSeq)
    println(s"[pq] q03 values equal: ${a.sameElements(b)}")
    val c = SparkEntry.queries("q22_sessionize")(spark, sfDir)
      .collect().map(_.toSeq)
    val d = q22Array.collect().map(_.toSeq)
    println(s"[pq] q22 values equal: ${c.sameElements(d)}")
    val e = SparkEntry.queries("q07_regional_revenue")(spark, sfDir)
      .collect().map(_.toSeq)
    val f = q07Semi.collect().map(_.toSeq)
    println(s"[pq] q07 values equal: ${e.sameElements(f)}")
    spark.stop()
  }
}
