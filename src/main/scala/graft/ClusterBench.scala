package graft

import org.apache.spark.sql.DataFrame

/** DEV-SIDE distributed-shuffle evidence harness (VERDICT r15 ask #2):
  * every committed number so far is `local[32]` — process-local
  * shuffle, one heap, zero serialization. This main runs the SAME gate
  * queries on a `local-cluster[w,c,mem]` master (real worker JVMs,
  * serialized shuffle blocks over localhost sockets) so the constants
  * the 100 TB design arguments lean on — shuffle volume, broadcast
  * build+ship, the r5 parked runtime-bloom decision — get their first
  * off-process measurement.
  *
  * Protocol per query (the ProfileR14/Bench protocol): warm once
  * untimed (JIT + codegen + parquet footers + executor class ship),
  * then `iters` timed full-plan noop writes with a GC fence and a
  * BLOCKING tracked-cache release between iterations. Additionally
  * prints a physical plan SIGNATURE (operator-class frequency map,
  * exchange/broadcast counts) so a local[32] run and a cluster run of
  * the same binary can be diffed for plan drift — the claim "plans
  * unchanged, only the execution substrate moved" is checkable from
  * the two outputs instead of asserted.
  *
  * Ends with the q07 runtime-bloom A/B when q07 is among the selected
  * gates: PERF_NOTES r5 parked the forced bloom as a no-win ON
  * process-local shuffle ("the first knob to re-measure" off it) —
  * here the orderkey shuffle actually serializes, so pruning ~94% of
  * shuffled lineitem rows finally buys network bytes, not just CPU.
  *
  * Usage: runMain graft.ClusterBench <sfDir> <iters> <master> [names...]
  *   master: "local" → local[32]; anything else is passed through
  *   (e.g. local-cluster[4,8,8192]). Cluster masters need `sbt
  *   package` first — executors load graft classes from the jar.
  *   names match gates by substring; default = the headline five +
  *   q31/q59/q108/q122 (the judge's prescribed distributed set).
  */
object ClusterBench {

  val DefaultSet = Seq("q02_pricing_summary", "q03_join_broadcast_dim",
    "q07_regional_revenue", "q11_window_rank", "q22_sessionize",
    "q31_lsh_buckets", "q59_near_dup_clusters", "q108prod_knn_graph",
    "q122prod_semantic_dedup")

  /** The q108/q122 GATE forms pin k=8 to replay the oracle's quantizer
    * — which makes their Σ|block|² candidate set corpus-quadratic past
    * gate SFs BY DESIGN (measured: gate-form q108 at the 50× replica
    * transiently filled >60 GB of shuffle spill before dying). The
    * distributed evidence therefore runs the PRODUCTION arms — the
    * k=0 default that derives k ≈ √(N/2), the documented scale-correct
    * blocking — which compute the same operator shape with a bounded
    * per-block working set.
    */
  val ProdArms: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q108prod_knn_graph" -> ((s, dir) =>
      graft.operators.Similarity.knnGraph(Tables(s, dir, "embeddings"))),
    "q122prod_semantic_dedup" -> ((s, dir) =>
      graft.operators.Similarity.semanticDedup(Tables(s, dir, "embeddings"))))

  def query(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
    ProdArms.getOrElse(name, SparkEntry.queries(name))

  /** Operator-class frequency signature of the physical plan, with the
    * exchange flavors split out (shuffle vs broadcast vs reused) —
    * the shape that must NOT drift between masters. AQE's wrapper node
    * hides the tree from a plain foreach (the executed plan is ONE
    * AdaptiveSparkPlan node until run — found when the first dumps all
    * read "AdaptiveSparkPlan=1"), so the signature is taken from the
    * STATIC plan built with AQE off, the Plans-dump convention; the
    * timed runs keep AQE on.
    */
  def planSignature(build: => DataFrame,
      spark: org.apache.spark.sql.SparkSession): String = {
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val counts = scala.collection.mutable.SortedMap[String, Int]()
      build.queryExecution.executedPlan.foreach { n =>
        val key = n.getClass.getSimpleName.stripSuffix("Exec")
        counts(key) = counts.getOrElse(key, 0) + 1
      }
      counts.map { case (k, v) => s"$k=$v" }.mkString(" ")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val master = args.lift(2).getOrElse("local-cluster[4,8,8192]")
    val wanted = args.drop(3)
    val spark =
      if (master == "local") GraftSession.local()
      else GraftSession.cluster(master)
    spark.sparkContext.setLogLevel("ERROR")
    // exact-name tokens select exactly that gate (r16 ADVICE: the bare
    // substring filter made a 'q108_knn_graph' request ALSO select the
    // gate form's quadratic sibling and vice versa — and a gate-form
    // q108/q122 at replica scale fills >60 GB of shuffle spill);
    // non-matching tokens still work as substrings.
    val all = SparkEntry.allDefs.map(_.name) ++ ProdArms.keys
    val names =
      if (wanted.isEmpty) DefaultSet
      else all.filter(n => wanted.exists(w =>
        if (all.contains(w)) n == w else n.contains(w)))
    println(s"[cluster] master=$master dir=$sfDir iters=$iters " +
      s"load=${Bench.loadavg()} executors=" +
      spark.sparkContext.statusTracker.getExecutorInfos.length)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      query(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (!sys.env.contains("GRAFT_NO_RELEASE"))
        graft.operators.CacheRegistry.release(blocking = true)
      t
    }

    for (n <- names) {
      println(s"[cluster] plan $n :: " +
        planSignature(query(n)(spark, sfDir), spark))
      if (iters > 0) {
        run(n)
        System.gc()
        val ts = (1 to iters).map(_ => run(n))
        println(f"[cluster] $n%-28s load=${Bench.loadavg()}%-14s best " +
          f"${ts.min}%8.3f  " + ts.map(t => f"$t%8.3f").mkString(" "))
      }
    }

    // q03 dim-attach A/B (VERDICT r16 ask #6): the cluster leg showed
    // +131% on q03 — the `part` broadcast is BUILT on the driver and
    // SHIPPED to every worker each run, where local[32] pays ~nothing.
    // The alternative keyed attach: perKey is already hash-partitioned
    // by l_partkey from its own aggregate, so forcing the part join
    // off broadcast costs ONE exchange of the 2-column part projection
    // (a single traversal of the wire) instead of worker-count ships.
    if (iters > 0 && names.exists(_.startsWith("q03"))) {
      val savedThresh =
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val savedPrefer =
        spark.conf.get("spark.sql.join.preferSortMergeJoin", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      println(s"[cluster] plan q03+shuffle-dim :: " + planSignature(
        SparkEntry.queries("q03_join_broadcast_dim")(spark, sfDir), spark))
      run("q03_join_broadcast_dim")
      System.gc()
      val ts = (1 to iters).map(_ => run("q03_join_broadcast_dim"))
      println(f"[cluster] q03+shuffle-dim            " +
        f"load=${Bench.loadavg()}%-14s best ${ts.min}%8.3f  " +
        ts.map(t => f"$t%8.3f").mkString(" "))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh)
      spark.conf.set("spark.sql.join.preferSortMergeJoin", savedPrefer)
    }

    // runtime-bloom re-measure on serialized shuffle (r5 parked knob)
    if (iters > 0 && names.exists(_.startsWith("q07"))) {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "512MB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val probe = SparkEntry.queries("q07_regional_revenue")(spark, sfDir)
      val fires = probe.queryExecution.executedPlan.toString
        .contains("might_contain")
      run("q07_regional_revenue")
      System.gc()
      val ts = (1 to iters).map(_ => run("q07_regional_revenue"))
      println(f"[cluster] q07+forced-bloom (fires=$fires) " +
        f"load=${Bench.loadavg()}%-14s best ${ts.min}%8.3f  " +
        ts.map(t => f"$t%8.3f").mkString(" "))
    }
    spark.stop()
  }
}
