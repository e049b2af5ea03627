package graft

/** Dev tool: fast plan-only sweep over every gate at an arbitrary SF
  * dir — no dump file, just build + PlanLint each plan and report. The
  * cheap first pass before a full Plans dump at replica scale
  * (VERDICT r13 item 5: scale-dependent shapes must fail a machine
  * check, not a manual read). Exits nonzero on any violation.
  */
object PlansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var bad = 0
    for (d <- SparkEntry.allDefs) {
      try {
        val df = d.spark(spark, sfDir)
        df.queryExecution.executedPlan // force physical planning
        val vs = PlanLint.lintGate(d.name, df)
        if (vs.nonEmpty) { bad += vs.size
          vs.foreach(v => println(s"[probe] LINT ${d.name}: $v"))
        } else println(s"[probe] ok ${d.name}")
      } catch { case e: Throwable =>
        bad += 1
        println(s"[probe] FAIL ${d.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(150)}")
      }
    }
    spark.stop()
    if (bad > 0) { println(s"[probe] FAILED: $bad violations"); sys.exit(1) }
  }
}
