package graft

/** DEV-SIDE round-16 measurement harness: the ProfileR14 protocol
  * (warm once, timed full-plan noop writes, GC fence + BLOCKING cache
  * release per iteration, loadavg printed per row) plus the quantized-
  * embeddings-projection legs this round deploys (VERDICT r15 ask #3):
  *
  *   runMain graft.ProfileR16 <sfDir> <iters> [embquant|dropembquant] <name>...
  *
  *  - `embquant`: drop + rewrite the quantized projection
  *    (CorpusWriter.writeEmbQuantProjection) for <sfDir> first — timed
  *    and reported separately, the layout_write_sec convention — then
  *    time the gates, which resolve it via embQuantProjection;
  *  - `dropembquant`: remove the projection so the SAME JVM times the
  *    plain-float leg (the A/B control, ProfileR15's factsreuse shape).
  *
  * The DuckDB side of a paired table: tools/bench_duckdb.py <sfDir>
  * <oracle_sql.json> <names> run back-to-back in the same window.
  */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    var wanted = args.drop(2)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    import graft.operators.CorpusWriter
    if (wanted.headOption.contains("dropembquant")) {
      wanted = wanted.drop(1)
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultEmbQuantTable)
      println("[r16] dropped quantized embeddings projection")
    }
    if (wanted.headOption.contains("embquant")) {
      wanted = wanted.drop(1)
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultEmbQuantTable)
      val t0 = System.nanoTime()
      val ok = CorpusWriter.writeEmbQuantProjection(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        sourceDir = Some(sfDir))
      println(f"[r16] embquant write ok=$ok ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val names = SparkEntry.allDefs.map(_.name)
      .filter(n => wanted.exists(n.contains))
    println(s"[r16] dir=$sfDir iters=$iters load=${ProfileR14.loadavg()} " +
      s"queries=${names.mkString(",")}")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (!sys.env.contains("GRAFT_NO_RELEASE"))
        graft.operators.CacheRegistry.release(blocking = true)
      t
    }
    for (n <- names) {
      run(n) // warm: JIT + codegen + parquet footers
      System.gc()
      val ts = (1 to iters).map(_ => run(n))
      println(f"[r16] $n%-28s load=${ProfileR14.loadavg()}%-6s " +
        ts.map(t => f"$t%8.3f").mkString(" "))
    }
    spark.stop()
  }
}
