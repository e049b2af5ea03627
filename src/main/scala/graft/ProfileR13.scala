package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DEV-SIDE round-13 measurement harness for the two `weak`-grade
  * censuses under rework:
  *
  *  - `q167`: rollingActive set-array spelling vs the bitmap-word
  *    spelling ([[graft.operators.EventFunnel.rollingActiveBitmap]]) —
  *    same output, different per-user state/fan-out machinery.
  *  - `q161`: per-stage decomposition of weeklySeasonality's wall
  *    (scan → +epoch/dow arithmetic → +(type,dow) agg → full census)
  *    plus the single-agg wide-counter candidate, to either find the
  *    lever or close the constant ~5× as engine-regime (the r9 q02
  *    protocol).
  *
  * Usage: runMain graft.ProfileR13 [sfDir] [iters] [op]
  *   op ∈ q167 | q161 (default both)
  */
object ProfileR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf200")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val op = args.lift(2).getOrElse("all")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheRegistry.release()
        t
      }
      println(f"[$name%-18s] " + times.map(t => f"$t%8.3f").mkString(" "))
    }

    val events = Tables.events(spark, sfDir)

    if (op == "q167" || op == "all") {
      time("q167 delta")(
        graft.operators.EventFunnel.rollingActive(events))
      time("q167 fanout")(
        graft.operators.EventFunnel.rollingActiveFanout(events))
      time("q167 bitmap")(
        graft.operators.EventFunnel.rollingActiveBitmap(events))
    }

    if (op == "facts") {
      // deployed fact-pair layout: write once (timed), then the
      // order-grain gates resolve it via Tables.apply substitution
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      import graft.operators.CorpusWriter
      Seq(CorpusWriter.DefaultLineitemTable, CorpusWriter.DefaultOrdersTable)
        .foreach(BucketRehearsal.dropBucketTable(spark, wh, _))
      val t0 = System.nanoTime()
      CorpusWriter.writeOrderFacts(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        spark.read.parquet(s"$sfDir/orders.parquet"),
        sourceDir = Some(sfDir))
      println(f"[facts write       ] ${(System.nanoTime() - t0) / 1e9}%8.3f")
      for (n <- Seq("q163_market_share", "q174_priority_latency",
          "q176_returned_customers", "q180_slow_order_census",
          "q07_regional_revenue", "q02_pricing_summary"))
        time(n)(SparkEntry.queries(n)(spark, sfDir))
    }

    if (op == "q161" || op == "all") {
      val sec = events.select(col("event_type"),
        Tables.epochSec(events).as("sec"))
      time("q161 S0 scan") {
        events.select(col("event_type"), col("ts"))
      }
      time("q161 S1 +dow") {
        sec.select(col("event_type"),
          expr("((sec DIV 86400) + 3) % 7").as("dow"))
      }
      time("q161 S2 +agg") {
        sec.select(col("event_type"),
          expr("((sec DIV 86400) + 3) % 7").as("dow"))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n"))
      }
      time("q161 S3 full")(
        graft.operators.EventFunnel.weeklySeasonality(events))
      // wide-counter candidate: ONE |types|-group agg, 7 conditional
      // counters, dow cells rebuilt by posexplode of the 7-slot array
      time("q161 C wide") {
        val counters = (0 to 6).map(k =>
          sum(when(col("dow") === k, 1L).otherwise(0L)).as(s"n$k"))
        val wide = sec.select(col("event_type"),
          expr("((sec DIV 86400) + 3) % 7").as("dow"))
          .groupBy(col("event_type"))
          .agg(counters.head, counters.tail: _*)
        val cells = wide.select(col("event_type"),
          posexplode(array((0 to 6).map(k => col(s"n$k")): _*))
            .as(Seq("dow", "n")))
          .where(col("n") > 0)
          .select(col("event_type"), col("dow").cast("long").as("dow"),
            col("n"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(20,0)")
        cells.groupBy(col("event_type"))
          .agg(sum(col("n")).as("n_events"),
            count(lit(1)).as("n_active_dows"),
            min(struct((-col("n")).as("neg"), col("dow").as("d"))).as("top"),
            sum(dec(col("n")) * dec(col("n"))).as("sum_sq"))
          .withColumn("hhi_num",
            col("sum_sq") * lit(1000000L).cast("decimal(20,0)"))
          .withColumn("hhi_den", dec(col("n_events")) * dec(col("n_events")))
          .select(col("event_type"), col("n_events"), col("n_active_dows"),
            col("top.d").as("peak_dow"),
            expr("(-top.neg) * 1000000 DIV n_events").as("peak_share_ppm"),
            expr("hhi_num DIV hhi_den").as("hhi_ppm"))
          .orderBy("event_type")
      }
    }
    spark.stop()
  }
}
