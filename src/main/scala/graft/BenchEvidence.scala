package graft

/** DEV-SIDE evidence harness for the PERF_NOTES bench-gap decomposition
  * (VERDICT r3 next-round #3). The official bench (BENCH_r{N}) runs on
  * the driver's single-row-group testdata; this main substantiates WHY
  * the residual DuckDB gap at that scale is a layout artifact plus a
  * fixed per-action floor, not a plan defect:
  *
  *  (a) measures the per-action floor — a noop-format write of a tiny
  *      fully-cached DataFrame, i.e. the cost of an action that does no
  *      scan, no shuffle and no real compute;
  *  (b) rewrites the SF dir into an N-file layout (each file one row
  *      group ⇒ N splits, the shape real 100 TB data has) and times the
  *      SAME headline queries on both layouts with the Bench protocol
  *      (warm-all, GC fence, best of 3).
  *
  * If the decomposition is right, per-query time on the multi-split
  * layout collapses toward `floor + work/parallelism`; if it does NOT
  * collapse, the plans have a real problem. Results feed PERF_NOTES.md.
  *
  * Usage: runMain graft.BenchEvidence <sfDir> <rewriteDir> [nSplits]
  */
object BenchEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rgDir = args(1)
    val nSplits = if (args.length > 2) args(2).toInt else 32
    val spark = GraftSession.local()

    // ---- (b) rewrite every table into nSplits files (1 row group each),
    // PRESERVING global row order: a plain repartition() would scatter
    // rows randomly, which un-clusters events/lineitem and slows the
    // window sorts — an artifact of the rewrite, not of file count. A
    // range partition on the original row index splits into contiguous
    // ordered chunks, exactly what a 100 TB multi-file table looks like.
    {
      import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
      Tables.all.foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .coalesce(1) // single input partition ⇒ monotonic id = row order
          .withColumn("__rn", monotonically_increasing_id())
          .repartitionByRange(nSplits, col("__rn"))
          .sortWithinPartitions("__rn")
          .drop("__rn")
          .write.mode("overwrite").parquet(s"$rgDir/$t.parquet")
      }
    }

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best3(name: String, dir: String): Double = {
      System.gc()
      (1 to 3).map(_ => run(name, dir)).min
    }

    // ---- (a) per-action floor: noop write of a cached 2-row DataFrame
    val tiny = spark.range(2).toDF("i").cache()
    tiny.count() // materialize the cache
    (1 to 3).foreach(_ => tiny.write.mode("overwrite").format("noop").save())
    val floor = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      tiny.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }.min

    // Bench protocol: warm every (query, layout) once untimed, then time
    SparkEntry.benchNames.foreach { n => run(n, sfDir); run(n, rgDir) }
    val rows = SparkEntry.benchNames.map { n =>
      (n, best3(n, sfDir), best3(n, rgDir))
    }

    val qs = rows.map { case (n, a, b) =>
      s""""$n":{"single_rg":$a,"multi_split":$b}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"bench_evidence","floor_sec":$floor,""" +
      s""""n_splits":$nSplits,"queries":$qs,""" +
      s""""total_single_rg":${rows.map(_._2).sum},""" +
      s""""total_multi_split":${rows.map(_._3).sum}}""")
    spark.stop()
  }
}
