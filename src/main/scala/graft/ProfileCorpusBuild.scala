package graft

import org.apache.spark.sql.functions._

/** Dev harness (VERDICT r10 item 7): the end-to-end
  * [[operators.TrainingCorpus.build]] wall at replica scale, with the
  * per-stage breakdown the `onStage` boundary callback reports — the
  * number that says whether the COMPOSED product (not just each gated
  * operator) holds up when the corpus grows.
  *
  * Stage walls are the wall between the funnel's own count actions, so
  * a stage's number includes whatever upstream lineage Spark chose to
  * recompute for it — that is the honest cost of the composition as
  * written (operators persist their own internals through
  * CacheRegistry; the funnel deliberately does not persist the corpus
  * between stages, because at 100 TB caching a corpus-sized frame per
  * stage is the thing you cannot do).
  *
  * isBenchmark = `doc_id % 97 == 0` (~1% of docs), deterministic and
  * scale-independent. Each iteration releases the CacheRegistry first,
  * so iteration 1 is cold and later ones show the operator-internal
  * cache effect.
  *
  * Usage: sbt "runMain graft.ProfileCorpusBuild [sfDir] [iters] [outDir]"
  */
object ProfileCorpusBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val outDir = args.lift(2).getOrElse("/tmp/corpus_build_out")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def loadavg: String =
      scala.util.Try(java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ").take(3).mkString(" ")).getOrElse("?")

    val docs = Tables(spark, sfDir, "documents")
    for (i <- 1 to iters) {
      operators.CacheRegistry.release()
      val walls = scala.collection.mutable.LinkedHashMap[String, Double]()
      println(s"[corpus-build] iter $i loadavg(before)=$loadavg")
      val t0 = System.nanoTime()
      val (_, funnel) = operators.TrainingCorpus.build(
        docs, isBenchmark = col("doc_id") % 97 === 0, outDir = outDir,
        onStage = (s, w) => walls(s) = w)
      val counts = funnel.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = (System.nanoTime() - t0) / 1e9
      walls.foreach { case (s, w) =>
        println(f"[corpus-build]   $s%-22s ${w}%8.2f s" +
          counts.get(s).map(c => f"  ($c%,d docs)").getOrElse(""))
      }
      val unattributed = total - walls.values.sum
      println(f"[corpus-build]   (outside stage actions)  " +
        f"$unattributed%8.2f s  (plan analysis, operator-internal " +
        "prelude jobs between boundaries)")
      println(f"[corpus-build] iter $i TOTAL $total%8.2f s " +
        s"loadavg(after)=$loadavg")
    }
    spark.stop()
  }
}
