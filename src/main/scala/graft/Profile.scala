package graft


/** Dev profiling harness: runs each selected query N times and prints
  * per-iteration wall times, so cold (JIT + footer-cache) vs steady-state
  * cost is visible. Usage:
  * sbt "runMain graft.Profile [sfDir] [iters] [nameRegex]".
  *
  * Each iteration ends with a BLOCKING cache release: gates that
  * `trackedPersist` an intermediate would otherwise hand every warm
  * iteration the cached collapse and report impossible walls — the
  * exact artifact that contaminated the first r15 800× q162/q198
  * samples (q198 "0.56 s" at 800× vs 1.65 s at 400×; PERF_NOTES r15).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val nameFilter = args.lift(2).map(_.r)
    val spark = GraftSession.local()

    val names = nameFilter match {
      case None => SparkEntry.benchNames
      case Some(re) =>
        SparkEntry.allDefs.map(_.name).filter(re.findFirstIn(_).isDefined)
    }
    for (name <- names) {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheRegistry.release(blocking = true)
        t
      }
      println(f"[profile] $name%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
