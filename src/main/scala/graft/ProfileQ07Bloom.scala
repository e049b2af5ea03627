package graft

import org.apache.spark.sql.DataFrame

/** Dev harness for the r4 verdict's last headline gap (q07 ~2.2× at
  * 50×): measures whether Spark's runtime row-level filtering (bloom
  * filter injected from the reduced orders side onto the lineitem scan
  * side of the orderkey join) pays for itself. The date+ASIA reduction
  * keeps ~6% of orders, so a bloom on l_orderkey could drop ~94% of
  * lineitem rows BEFORE the big shuffle — if the injection fires and
  * the filter evaluation cost doesn't eat the win.
  *
  * Usage: runMain graft.ProfileQ07Bloom [sfDir] [iters]
  */
object ProfileQ07Bloom {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val bloomKeys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    for (k <- bloomKeys)
      println(s"[pq7] default $k = ${spark.conf.getOption(k).getOrElse("?")}")

    def q07: DataFrame = SparkEntry.queries("q07_regional_revenue")(spark, sfDir)

    def run(name: String): Unit = {
      val plan = q07.queryExecution.executedPlan.toString
      val hasBloom = plan.contains("might_contain") ||
        q07.queryExecution.optimizedPlan.toString.contains("bloom")
      q07.write.mode("overwrite").format("noop").save() // warm JIT per plan
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        q07.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pq7] $name%-22s bloom_in_plan=$hasBloom%-5s best ${times.min}%7.3f  " +
        times.map(x => f"$x%6.3f").mkString(" "))
    }

    run("current_defaults")

    // bloom is ON by default in Spark 4 but does not fire for q07: the
    // creation side (reduced orders ⋈ customer) is estimated above the
    // 10 MB creationSideThreshold. Open both gates and re-check.
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
    run("bloom_forced")

    // value parity (gate pins the committed plan's values)
    val withBloom = q07.collect().map(_.toSeq)
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "10GB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    val base = q07.collect().map(_.toSeq)
    println(s"[pq7] values equal: ${base.sameElements(withBloom)}")
    spark.stop()
  }
}
