package graft
object PlansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- SparkEntry.allDefs) {
      try {
        val df = d.spark(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(s"[probe] ok ${d.name}")
      } catch { case e: Throwable =>
        println(s"[probe] FAIL ${d.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(150)}")
      }
    }
    spark.stop()
  }
}
