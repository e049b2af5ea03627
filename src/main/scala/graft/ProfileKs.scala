package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DEV-SIDE per-stage decomposition of q198 ksValueDrift's wall (the
  * r9 q02 / r12 q161 closure protocol): is the 200× residual a
  * plan-shaped defect or the scan+grouped-agg engine regime?
  *
  * Stages nest: S0 bare (event_type, value) scan → S1 + cents
  * projection → S2 + (type, cents) hash aggregate (the one
  * corpus-sized exchange) → S3 the full census (pair fan-out, per-pair
  * windows, max — all value-domain-sized).
  *
  * Usage: runMain graft.ProfileKs [sfDir] [iters]
  */
object ProfileKs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf200")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[$name%-12s] " + times.map(t => f"$t%8.3f").mkString(" "))
    }

    def ev = Tables.events(spark, sfDir)
    time("S0_scan")(ev.select(col("event_type"), col("value")))
    time("S1_cents")(ev.select(col("event_type"),
      floor(col("value") * 100 + 0.5).as("v")))
    time("S2_agg")(ev.select(col("event_type"),
      floor(col("value") * 100 + 0.5).as("v"))
      .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("c")))
    time("S3_full")(graft.operators.EventFunnel.ksValueDrift(ev))

    // sub-stages of the downstream (all value-domain-sized): where do
    // the ~2 s between S2 and S3 go?
    import org.apache.spark.sql.expressions.Window
    def c = ev.select(col("event_type").as("t"),
        floor(col("value") * 100 + 0.5).as("v"))
      .groupBy(col("t"), col("v")).agg(count(lit(1)).as("c"))
    def tot = c.groupBy(col("t")).agg(sum(col("c")).as("n"))
    def pairs = tot.as("x").join(tot.as("y"), col("x.t") < col("y.t"))
      .select(col("x.t").as("ta"), col("y.t").as("tb"),
        col("x.n").as("na"), col("y.n").as("nb"))
    def sided = c
      .join(broadcast(pairs), col("t") === col("ta") || col("t") === col("tb"))
      .select(col("ta"), col("tb"), col("na"), col("nb"), col("v"),
        when(col("t") === col("ta"), col("c")).otherwise(0L).as("ca"),
        when(col("t") === col("tb"), col("c")).otherwise(0L).as("cb"))
    def merged = sided
      .groupBy(col("ta"), col("tb"), col("na"), col("nb"), col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val w = Window.partitionBy("ta", "tb").orderBy("v")
    time("S2b_sided")(sided)
    time("S2c_merged")(merged)
    time("S2d_cum")(merged.withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w)))
    spark.stop()
  }
}
