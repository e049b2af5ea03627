package graft

/** DEV-SIDE k-scaling sweep for the blocked KNN graph (q108): the
  * candidate term is Σ|block|² = N²/k, so the blocking parameter must
  * GROW with the corpus (k ≈ √N keeps blocks ~√N); the gate pins
  * correctness at the small-SF default (k=8), and this harness
  * measures what the right k buys at replica scale.
  *
  * Usage: runMain graft.ProfileKnn [sfDir] [iters] [k1,k2,...] [op]
  * `op`: knn (default), semdedup, or semdedup2 (two-level cells,
  * k1=k2=k) — all blocked Σ|block|² ops sharing the trained quantizer,
  * so the same sweep applies.
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val ks = args.lift(2).getOrElse("8,32,64,128")
      .split(",").map(_.trim.toInt).toSeq
    val op = args.lift(3).getOrElse("knn")
    require(Set("knn", "semdedup", "semdedup2")(op), s"unknown op '$op'")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- ks) {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = op match {
          case "knn" => graft.operators.Similarity
            .knnGraph(Tables(spark, sfDir, "embeddings"),
              k = k, sampleN = math.max(256, 2 * k))
          case "semdedup" => graft.operators.Similarity
            .semanticDedup(Tables(spark, sfDir, "embeddings"),
              k = k, sampleN = math.max(256, 2 * k))
          case "semdedup2" => graft.operators.Similarity
            .semanticDedupTwoLevel(Tables(spark, sfDir, "embeddings"),
              k1 = k, k2 = k, sampleN = math.max(256, 2 * k))
        }
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[$op] k=$k%-4d " + times.map(t => f"$t%8.3f").mkString(" "))
      // the trained prelude persists centroids/scores/assignments per
      // (k, salt); without this a long sweep accumulates every point's
      // cached blocks for the session lifetime (ADVICE r8). r10: the
      // precise engine-frame release replaces the global clearCache
      // sledgehammer (which would also evict a user's own caches).
      graft.operators.CacheRegistry.release()
    }
    spark.stop()
  }
}
