package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DEV-SIDE round-17 measurement harness (VERDICT r16 asks #1/#4/#5):
  * stage-level decomposition of the operators named by the judge, so
  * every optimization this round starts from a measured split, not a
  * guess. Protocol: ProfileR14/R16 conventions — warm runs, GC fence,
  * BLOCKING cache release between iterations, loadavg printed per row,
  * plus a stage-completion listener totalling shuffle read/write bytes
  * per phase (the §2 evidence the CC-loop work needs).
  *
  * Modes (runMain graft.ProfileR17 <mode> <sfDir> [iters]):
  *  - q59decomp: split q59_near_dup_clusters into (pair generation |
  *    CC contraction loop, per-iteration | final labeling) — the
  *    numbers that decide where the 155 s at 50x actually goes.
  *  - q31decomp: q31_lsh_buckets phase split (shingle+minhash agg |
  *    bucket agg) with GC time per phase (ask #4: "GC-bound" claim).
  *  - aggdecomp: q183/q198 scan-vs-aggregate split at replica scale
  *    (ask #5: the floor decomposition the weak-set rows need).
  */
object ProfileR17 {

  def loadavg(): String = Bench.loadavg()

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("q59decomp")
    val sfDir = args.lift(1).getOrElse("/tmp/sf50")
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    // phase-scoped shuffle + GC totals (DedupRehearsal's listener shape)
    val shufR = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shufR.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        gcMs.addAndGet(s.stageInfo.taskMetrics.jvmGCTime)
      }
    })
    def phase[A](label: String)(body: => A): A = {
      // listener events are async; a short drain pause keeps the per-
      // phase byte split honest (phases are seconds-scale)
      Thread.sleep(300)
      val (r0, w0, g0) = (shufR.get, shufW.get, gcMs.get)
      val t0 = System.nanoTime()
      val out = body
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[r17] $label%-34s ${t}%8.3f s  shufR=${(shufR.get - r0) / 1e6}%9.1f MB" +
        f"  shufW=${(shufW.get - w0) / 1e6}%9.1f MB  gc=${(gcMs.get - g0) / 1e3}%6.1f s" +
        f"  load=${loadavg()}")
      out
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    mode match {
      case "q59decomp" =>
        import graft.operators.Dedup
        val docs = Tables(spark, sfDir, "documents")
        for (i <- 1 to iters) {
          println(s"[r17] --- q59 decomposition iter $i ---")
          // stage A: the LSH -> exact-verify pair pipeline, executed once
          val pairs = phase("A: pair generation (checkpoint)") {
            Dedup.nearDupPairs(docs).select(col("a"), col("b"))
              .localCheckpoint(true)
          }
          val nPairs = phase("A2: pair count")(pairs.count())
          println(s"[r17]   pairs=$nPairs")
          // stage B: the star-contraction loop exactly as shipped,
          // per-iteration walls
          var edges = phase("B0: edges distinct+checkpoint") {
            pairs.select(col("a").as("u"), col("b").as("v"))
              .where(col("u") =!= col("v")).distinct().localCheckpoint(true)
          }
          val nodes = phase("B0b: node set") {
            pairs.select(col("a").as("node"))
              .union(pairs.select(col("b").as("node")))
              .distinct().localCheckpoint(true)
          }
          var edgeCount = edges.count()
          var converged = false
          var it = 0
          while (!converged && it < 20) {
            val next = phase(f"B${it + 1}: star round (edges=$edgeCount)") {
              smallStar(largeStar(edges)).localCheckpoint(true)
            }
            val nextCount = next.count()
            converged = nextCount == edgeCount &&
              phase(f"B${it + 1}b: except check")(next.except(edges).isEmpty)
            edges = next
            edgeCount = nextCount
            it += 1
          }
          println(s"[r17]   rounds=$it finalEdges=$edgeCount")
          // stage C: labeling + sizes + final orderBy
          phase("C: label+sizes+orderBy") {
            val starLabels = edges.groupBy(col("u")).agg(min(col("v")).as("lbl"))
            val labels = nodes
              .join(starLabels, nodes("node") === starLabels("u"), "left")
              .select(col("node"), coalesce(col("lbl"), col("node")).as("label"))
            val sizes = labels.groupBy(col("label"))
              .agg(count(lit(1)).as("cluster_size"))
            noop(labels.join(sizes, "label")
              .select(col("node").as("doc_id"), col("label").as("cluster"),
                col("cluster_size"))
              .orderBy("doc_id"))
          }
          // control: the shipped gate, same window
          phase("FULL q59 gate (control)") {
            noop(SparkEntry.queries("q59_near_dup_clusters")(spark, sfDir))
          }
          graft.operators.CacheRegistry.release(blocking = true)
          System.gc()
        }

      case "q31decomp" =>
        import graft.operators.Dedup
        val docs = Tables(spark, sfDir, "documents")
        for (i <- 1 to iters) {
          println(s"[r17] --- q31 decomposition iter $i ---")
          phase("A: minhash only (noop)") {
            noop(Dedup.minhash(docs))
          }
          phase("B: full q31 gate") {
            noop(SparkEntry.queries("q31_lsh_buckets")(spark, sfDir))
          }
          graft.operators.CacheRegistry.release(blocking = true)
          System.gc()
        }

      case "aggdecomp" =>
        // q183/q198 floor split: events scan alone vs the full gates
        for (i <- 1 to iters) {
          println(s"[r17] --- q183/q198 decomposition iter $i ---")
          val ev = Tables(spark, sfDir, "events")
          phase("A: events scan (value,type only)") {
            noop(ev.select(col("type"), col("value")))
          }
          phase("B: (type,cents) collapse only") {
            noop(ev.select(col("type"),
              floor(col("value") * 100 + 0.5).cast("long").as("cents"))
              .groupBy("type", "cents").agg(count(lit(1)).as("n")))
          }
          phase("C: full q183 gate") {
            noop(SparkEntry.queries("q183_value_percentiles")(spark, sfDir))
          }
          phase("D: full q198 gate") {
            noop(SparkEntry.queries("q198_ks_value_drift")(spark, sfDir))
          }
          graft.operators.CacheRegistry.release(blocking = true)
          System.gc()
        }

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }

  // the shipped largeStar/smallStar, replicated verbatim for
  // per-iteration instrumentation (Dedup's are loop-internal defs)
  private def largeStar(e: DataFrame): DataFrame = {
    val dir = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = dir.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("m"))
    dir.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }
  private def smallStar(e: DataFrame): DataFrame = {
    val o = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = o.groupBy(col("u")).agg(min(col("v")).as("m"))
    o.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }
}
