package graft

/** DEV-SIDE round-14 measurement harness: times arbitrary GATE queries
  * on an arbitrary SF dir with the Bench protocol (warm once, then
  * timed full-plan noop writes with a GC fence and cache release
  * between iterations), printing every sample plus the host loadavg so
  * paired same-window Spark-vs-DuckDB tables can be recorded in
  * PERF_NOTES (VERDICT r13 items 2 and 4: the multi-scale amortization
  * curves that settle the eight `weak` gates, and the 400× deployed-
  * layout pins for q02/q163).
  *
  * Usage: runMain graft.ProfileR14 <sfDir> <iters> [facts] <name> [...]
  *   names match gate names by substring (e.g. "q162" → q162_...);
  *   a leading "facts" writes the deployed orderkey-co-bucketed
  *   lineitem/orders pair first and times the gates on that layout.
  * The DuckDB side of the pair: tools/bench_duckdb.py <sfDir>
  * <oracle_sql.json> <full names> run back-to-back in the same window.
  */
object ProfileR14 {
  def loadavg(): String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ").take(1).mkString)
      .getOrElse("?")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    var wanted = args.drop(2)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // "facts" before the names: write the deployed orderkey-co-bucketed
    // lineitem/orders pair first (timed, reported separately like
    // layout_write_sec), then time the gates on that layout via the
    // Tables.apply substitution — the ProfileR13 `facts` protocol.
    // "dropfacts": remove the bucketed fact-pair tables so subsequent
    // runs measure the PLAIN layout (the A/B control).
    if (wanted.headOption.contains("dropfacts")) {
      wanted = wanted.drop(1)
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      import graft.operators.CorpusWriter
      Seq(CorpusWriter.DefaultLineitemTable, CorpusWriter.DefaultOrdersTable)
        .foreach(BucketRehearsal.dropBucketTable(spark, wh, _))
      println("[r14] dropped fact-pair tables")
    }
    if (wanted.headOption.contains("facts")) {
      wanted = wanted.drop(1)
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      import graft.operators.CorpusWriter
      Seq(CorpusWriter.DefaultLineitemTable, CorpusWriter.DefaultOrdersTable)
        .foreach(BucketRehearsal.dropBucketTable(spark, wh, _))
      val t0 = System.nanoTime()
      CorpusWriter.writeOrderFacts(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        spark.read.parquet(s"$sfDir/orders.parquet"),
        sourceDir = Some(sfDir))
      println(f"[r14] facts write ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val names = SparkEntry.allDefs.map(_.name)
      .filter(n => wanted.exists(n.contains))
    println(s"[r14] dir=$sfDir iters=$iters load=${loadavg()} " +
      s"queries=${names.mkString(",")}")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      // blocking: an async eviction racing the next iteration's
      // re-persist hands it a dying cache entry (see CacheRegistry).
      // GRAFT_NO_RELEASE=1 keeps caches across iterations (diagnostic).
      if (!sys.env.contains("GRAFT_NO_RELEASE"))
        graft.operators.CacheRegistry.release(blocking = true)
      t
    }
    for (n <- names) {
      run(n) // warm: JIT + codegen + parquet footers
      System.gc()
      val ts = (1 to iters).map(_ => run(n))
      println(f"[r14] $n%-28s load=${loadavg()}%-6s " +
        ts.map(t => f"$t%8.3f").mkString(" "))
    }
    spark.stop()
  }
}
