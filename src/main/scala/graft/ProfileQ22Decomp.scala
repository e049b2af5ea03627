package graft

import org.apache.spark.sql.functions._

/** Dev decomposition of q22's 50x cost: bare scan, +epoch-seconds
  * projection, +per-user count agg, +sorted-array session count (the
  * full query minus ORDER BY), full query. Each stage isolates one
  * plan component so the residual attribution is measured, not
  * guessed. Usage: runMain graft.ProfileQ22Decomp [sfDir] [iters]
  */
object ProfileQ22Decomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    def ev = Tables(spark, sfDir, "events")
    def sec = Tables.epochSec(ev)

    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan_user_only" -> (() => ev.select(col("user_id"))),
      "scan_plus_sec" -> (() => ev.select(col("user_id"), sec.as("sec"))),
      "sec_group_count" -> (() =>
        ev.select(col("user_id"), sec.as("sec"))
          .groupBy("user_id").agg(count(lit(1)).as("n"))),
      "collect_sorted" -> (() =>
        ev.select(col("user_id"), sec.as("sec"))
          .groupBy("user_id")
          .agg(array_sort(collect_list(col("sec"))).as("secs"))),
      "full_no_sort" -> (() =>
        ev.select(col("user_id"), sec.as("sec"))
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
            col("n_events"))),
      "full_q22" -> (() => SparkEntry.queries("q22_sessionize")(spark, sfDir)))

    for ((name, mk) <- stages) {
      mk().write.mode("overwrite").format("noop").save()
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q22d] $name%-16s best ${ts.min}%7.3f  " +
        ts.map(x => f"$x%6.3f").mkString(" "))
    }
    spark.stop()
  }
}
