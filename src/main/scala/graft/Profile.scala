package graft


/** Dev profiling harness: runs each selected query N times and prints
  * per-iteration wall times, so cold (JIT + footer-cache) vs steady-state
  * cost is visible. Usage:
  * sbt "runMain graft.Profile [sfDir] [iters] [nameRegex]".
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
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
