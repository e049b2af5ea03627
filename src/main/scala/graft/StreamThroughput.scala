package graft

import java.nio.file.Files

import graft.engine.{Delivery, WebhookConfig, WebhookEngine}
import graft.streaming.StreamIngest

/** Dev evidence harness: measured throughput of the micro-batch
  * ingestion path (events/s through route → filter gate → transform →
  * delivery handoff → distributed audit), with a no-op delivery so the
  * number isolates ENGINE cost from destination latency.
  *
  * Two webhook shapes bound the contract:
  *  - `proj`: a projection transform — eligible for the set-oriented
  *    channel (one compiled plan per (webhook, batch); the 100 TB path);
  *  - `agg`: a LIMIT transform — ineligible by contract (arbitrary SQL
  *    may aggregate over `{{payload}}`), so it pays the per-event
  *    fallback. The printed ratio is the measured value of the r5
  *    set-oriented channel.
  *
  * A third shape, `latency`, reruns the set-oriented channel against a
  * destination with simulated per-call latency (default 50 ms) — the
  * regime real HTTP delivery lives in — to measure the bounded-parallel
  * delivery pool rather than raw engine cost.
  *
  * Usage: sbt "runMain graft.StreamThroughput [nProj] [nAgg] [latencyMs]".
  *
  * A separate mode drives the STREAMING SEMANTIC DEDUP state machine
  * ([[graft.streaming.CorpusStreamOps.semanticDedupCandidates]]) at
  * replica scale — the r9 operator had correctness pins but no
  * throughput evidence (VERDICT r10 item 5). It feeds the replica's
  * embeddings through a MemoryStream in fixed-size batches and prints,
  * per micro-batch: wall seconds, events/s, the state store's row
  * count and memory, and emitted flags — swept over `maxCluster` caps
  * (the per-cluster exemplar bound, i.e. the state-size/recall dial).
  *
  * Usage: sbt "runMain graft.StreamThroughput semdedup [sfDir]
  *   [batchSize] [nBatches] [k] [cap1,cap2,...]".
  */
object StreamThroughput {

  /** State bytes from a progress row: `memoryUsedBytes` stopped
    * populating for flatMapGroupsWithState in the current Spark build
    * (it read 5.2 MB for the same chunkdedup leg in r10); fall back to
    * the HDFS store's stateOnCurrentVersionSizeBytes custom metric.
    */
  private def stateBytes(
      st: Option[org.apache.spark.sql.streaming.StateOperatorProgress])
      : Long =
    st.map { o =>
      if (sys.env.contains("GRAFT_STATE_DEBUG"))
        println(s"[state-debug] mem=${o.memoryUsedBytes} custom=" +
          s"${Option(o.customMetrics).map(_.toString).getOrElse("-")}")
      if (o.memoryUsedBytes > 0) o.memoryUsedBytes
      else Option(o.customMetrics)
        .map(m => m.getOrDefault("stateOnCurrentVersionSizeBytes", 0L)
          .longValue())
        .getOrElse(0L)
    }.getOrElse(0L)

  /** Bytes-level state-size signal (VERDICT r15 ask #7): sample the
    * store directly through the state data source
    * (`spark.read.format("statestore")` over the checkpoint) and
    * [[org.apache.spark.util.SizeEstimator]] the materialized rows —
    * an in-memory-object estimate of the latest committed version,
    * labeled `~` in the tables. The progress metrics are NOT the
    * primary signal: for flatMapGroupsWithState in this build they
    * either read 0 (r15) or only the loaded-map overhead (measured
    * 1536 B while the 5 capped histograms actually hold ~10⁴ map
    * entries each), so they are the fallback when the source can't
    * read the store (e.g. no commit yet). Sampled OUTSIDE the timed
    * region, so the wall/eps numbers are untouched.
    */
  private def stateBytesSampled(spark: org.apache.spark.sql.SparkSession,
      st: Option[org.apache.spark.sql.streaming.StateOperatorProgress],
      ckDir: String): Long = {
    try {
      // estimate per partition on the executors and ship only one long
      // each (r16 ADVICE: collecting the whole store to the driver can
      // GC-stall the harness JVM at large caps, bleeding into the NEXT
      // batch's timed wall)
      val est = spark.read.format("statestore").load(ckDir).rdd
        .mapPartitions(it => Iterator.single(
          it.map(org.apache.spark.util.SizeEstimator.estimate(_)).sum))
        .collect().sum
      if (sys.env.contains("GRAFT_STATE_DEBUG"))
        println(s"[state-debug] sampled est=$est")
      est
    } catch { case e: Exception =>
      if (sys.env.contains("GRAFT_STATE_DEBUG"))
        println(s"[state-debug] statestore read failed: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      stateBytes(st)
    }
  }

  def semanticDedupLeg(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/tmp/sf200")
    val batchSize = args.lift(2).map(_.toInt).getOrElse(20000)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(20)
    val k = args.lift(4).map(_.toInt).getOrElse(64)
    val caps = args.lift(5).getOrElse("256,1024,4096")
      .split(",").map(_.trim.toInt).toSeq
    // threshold > 1 makes NOTHING match, so every arrival becomes an
    // exemplar until its cluster caps out — the adversarial regime that
    // shows maxCluster as the state/cost bound (the replica's default
    // regime saturates at true diversity instead: 200 copies of 2000
    // vectors → ~900 exemplars total, caps never bind)
    val threshold = args.lift(6).map(_.toDouble).getOrElse(0.25)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.CorpusStreamOps
    val emb = Tables(spark, sfDir, "embeddings")
    val cents = CorpusStreamOps.collectCentroids(
      graft.operators.Similarity.trainedCentroids(emb, k = k,
        sampleN = math.max(256, 2 * k), iters = 2))
    graft.operators.CacheRegistry.release()
    println(s"[semdedup-stream] trained ${cents.length} centroids " +
      s"(d=${cents.head._2.length})")
    val ids = emb.select("vec_id").orderBy("vec_id").as[Long].collect()
    val chunks = ids.take(math.min(ids.length.toLong,
      batchSize.toLong * nBatches).toInt).grouped(batchSize).toSeq
    for (cap <- caps) {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[CorpusStreamOps.VecIn]
      val ck = Files.createTempDirectory("semdedup-ck").toString
      val q = CorpusStreamOps
        .semanticDedupCandidates(mem.toDS(), cents, threshold = threshold,
          maxCluster = cap)
        .writeStream.format("noop")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ck)
        .start()
      try {
        var totalRows = 0L
        var totalSec = 0.0
        chunks.zipWithIndex.foreach { case (chunk, i) =>
          // materialize the batch OUTSIDE the timed region
          val batch = emb
            .where(org.apache.spark.sql.functions.col("vec_id")
              .between(chunk.head, chunk.last))
            .selectExpr("vec_id", "embedding")
            .as[CorpusStreamOps.VecIn].collect()
          val t0 = System.nanoTime()
          mem.addData(batch.toIndexedSeq)
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          totalRows += batch.length; totalSec += sec
          val p = q.lastProgress
          val st = p.stateOperators.headOption
          println(f"[semdedup-stream] cap=$cap%-5d batch=$i%2d " +
            f"n=${batch.length}%6d wall=$sec%6.2fs " +
            f"eps=${batch.length / sec}%8.0f " +
            f"stateRows=${st.map(_.numRowsTotal).getOrElse(-1L)}%5d " +
            f"stateMB~=${stateBytesSampled(spark, st, ck) / 1e6}%7.1f " +
            f"flags=${p.sink.numOutputRows}%7d")
        }
        println(f"[semdedup-stream] cap=$cap%-5d TOTAL n=$totalRows " +
          f"wall=$totalSec%7.2fs eps=${totalRows / totalSec}%8.0f")
      } finally q.stop()
    }
    spark.stop()
  }

  /** Streaming CHUNK dedup throughput ([[graft.streaming.CorpusStreamOps
    * .chunkDupFlags]]): feeds a replica's documents through a
    * MemoryStream in fixed batches, printing per-batch wall/eps/state
    * size/flag volume, swept over the per-bucket cap. On a ScaleUp
    * replica every doc's text repeats factor-fold, so the state-row
    * count must PLATEAU at the base corpus's distinct-chunk count
    * while flags keep flowing — the bounded-state claim, measured.
    *
    * Usage: runMain graft.StreamThroughput chunkdedup [sfDir]
    *   [batchSize] [nBatches] [cap1,cap2,...]
    */
  def chunkDedupLeg(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/tmp/sf200")
    val batchSize = args.lift(2).map(_.toInt).getOrElse(10000)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(10)
    val caps = args.lift(4).getOrElse("64,256")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.CorpusStreamOps
    val docs = Tables(spark, sfDir, "documents")
    val ids = docs.select("doc_id").orderBy("doc_id").as[Long].collect()
    val chunks = ids.take(math.min(ids.length.toLong,
      batchSize.toLong * nBatches).toInt).grouped(batchSize).toSeq
    for (cap <- caps) {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[CorpusStreamOps.DocIn]
      val ck = Files.createTempDirectory("chunkdedup-ck").toString
      val q = CorpusStreamOps.chunkDupFlags(mem.toDS(), maxBucket = cap)
        .writeStream.format("noop")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ck)
        .start()
      try {
        var totalRows = 0L
        var totalSec = 0.0
        chunks.zipWithIndex.foreach { case (chunk, i) =>
          val batch = docs
            .where(org.apache.spark.sql.functions.col("doc_id")
              .between(chunk.head, chunk.last))
            .selectExpr("doc_id", "text")
            .as[CorpusStreamOps.DocIn].collect()
          val t0 = System.nanoTime()
          mem.addData(batch.toIndexedSeq)
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          totalRows += batch.length; totalSec += sec
          val p = q.lastProgress
          val st = p.stateOperators.headOption
          println(f"[chunkdedup-stream] cap=$cap%-4d batch=$i%2d " +
            f"n=${batch.length}%6d wall=$sec%6.2fs " +
            f"eps=${batch.length / sec}%8.0f " +
            f"stateRows=${st.map(_.numRowsTotal).getOrElse(-1L)}%6d " +
            f"stateMB~=${stateBytesSampled(spark, st, ck) / 1e6}%7.1f " +
            f"flags=${p.sink.numOutputRows}%8d")
        }
        println(f"[chunkdedup-stream] cap=$cap%-4d TOTAL n=$totalRows " +
          f"wall=$totalSec%7.2fs eps=${totalRows / totalSec}%8.0f")
      } finally q.stop()
    }
    spark.stop()
  }

  /** Streaming KS drift monitor throughput ([[graft.streaming
    * .EventStreamOps.ksHistUpdates]]): feeds replica events through a
    * MemoryStream in fixed batches, printing per-batch wall/eps/state
    * rows+bytes/emitted rows, swept over `maxDistinctPerType`. The
    * bounded-state claim measured: state rows must PLATEAU at |types|
    * (5) with per-type histograms capped at min(cap, |distinct cents
    * per type| ≤ 9 913 on this corpus) while batch walls stay flat —
    * the emission bound is O(|types|·|domain|) per batch regardless of
    * event volume.
    *
    * Usage: runMain graft.StreamThroughput ksdrift [sfDir] [batchSize]
    *   [nBatches] [cap1,cap2,...]
    */
  def ksDriftLeg(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/tmp/sf50")
    val batchSize = args.lift(2).map(_.toInt).getOrElse(200000)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(10)
    val caps = args.lift(4).getOrElse("1000000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.EventStreamOps
    val rows = Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(value AS DOUBLE) AS value")
      .limit(batchSize * nBatches)
      .as[EventStreamOps.VEv].collect()
    for (cap <- caps) {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStreamOps.VEv]
      val ck = Files.createTempDirectory("ksdrift-ck").toString
      val q = EventStreamOps.ksHistUpdates(mem.toDS(),
          maxDistinctPerType = cap)
        .writeStream.format("noop")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ck)
        .start()
      try {
        var totalRows = 0L
        var totalSec = 0.0
        rows.grouped(batchSize).zipWithIndex.foreach { case (batch, i) =>
          val t0 = System.nanoTime()
          mem.addData(batch.toIndexedSeq)
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          totalRows += batch.length; totalSec += sec
          val p = q.lastProgress
          val st = p.stateOperators.headOption
          println(f"[ksdrift-stream] cap=$cap%-8d batch=$i%2d " +
            f"n=${batch.length}%7d wall=$sec%6.2fs " +
            f"eps=${batch.length / sec}%9.0f " +
            f"stateRows=${st.map(_.numRowsTotal).getOrElse(-1L)}%4d " +
            f"stateMB~=${stateBytesSampled(spark, st, ck) / 1e6}%7.1f " +
            f"out=${p.sink.numOutputRows}%4d")
        }
        println(f"[ksdrift-stream] cap=$cap%-8d TOTAL n=$totalRows " +
          f"wall=$totalSec%7.2fs eps=${totalRows / totalSec}%9.0f")
      } finally q.stop()
    }
    spark.stop()
  }

  /** Streaming rolling-active delta throughput ([[graft.streaming
    * .EventStreamOps.rollingActiveDeltas]]): per-user credited-day-set
    * state, so state rows track DISTINCT USERS SEEN (plateauing once
    * the replica's user population has all appeared) and per-batch
    * emission is bounded by new (user, window-end-day) coverage — both
    * printed per batch with the wall, so the flat-batch-duration and
    * cap-proportional-state claims are measured, not argued.
    *
    * Usage: runMain graft.StreamThroughput rollingactive [sfDir]
    *   [batchSize] [nBatches] [windowDays]
    */
  def rollingActiveLeg(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/tmp/sf50")
    val batchSize = args.lift(2).map(_.toInt).getOrElse(200000)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(10)
    val windowDays = args.lift(4).map(_.toInt).getOrElse(7)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.EventStreamOps
    val rows = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id")
      .limit(batchSize * nBatches)
      .as[EventStreamOps.Ev].collect()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreamOps.Ev]
    val ck = Files.createTempDirectory("rollingactive-ck").toString
    val q = EventStreamOps.rollingActiveDeltas(mem.toDS(),
        windowDays = windowDays)
      .writeStream.format("noop")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", ck)
      .start()
    try {
      var totalRows = 0L
      var totalSec = 0.0
      rows.grouped(batchSize).zipWithIndex.foreach { case (batch, i) =>
        val t0 = System.nanoTime()
        mem.addData(batch.toIndexedSeq)
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        totalRows += batch.length; totalSec += sec
        val p = q.lastProgress
        val st = p.stateOperators.headOption
        println(f"[rollact-stream] w=$windowDays%-2d batch=$i%2d " +
          f"n=${batch.length}%7d wall=$sec%6.2fs " +
          f"eps=${batch.length / sec}%9.0f " +
          f"stateRows=${st.map(_.numRowsTotal).getOrElse(-1L)}%8d " +
          f"stateMB~=${stateBytesSampled(spark, st, ck) / 1e6}%7.1f " +
          f"out=${p.sink.numOutputRows}%7d")
      }
      println(f"[rollact-stream] w=$windowDays%-2d TOTAL n=$totalRows " +
        f"wall=$totalSec%7.2fs eps=${totalRows / totalSec}%9.0f")
    } finally q.stop()
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("semdedup")) { semanticDedupLeg(args); return }
    if (args.headOption.contains("chunkdedup")) { chunkDedupLeg(args); return }
    if (args.headOption.contains("ksdrift")) { ksDriftLeg(args); return }
    if (args.headOption.contains("rollingactive")) { rollingActiveLeg(args); return }
    val nProj = args.headOption.map(_.toInt).getOrElse(50000)
    val nAgg = args.lift(1).map(_.toInt).getOrElse(500)
    val latencyMs = args.lift(2).map(_.toLong).getOrElse(50L)
    val spark = GraftSession.local()
    import spark.implicits._

    @volatile var delayMs = 0L
    val e = new WebhookEngine(spark,
      Files.createTempDirectory("graft-throughput").toString,
      (_, _, _) => {
        if (delayMs > 0) Thread.sleep(delayMs)
        Delivery.Result(success = true, Some(200), "ok")
      })
    e.register(WebhookConfig("/proj", "https://sink.invalid/x",
      "SELECT v, v * 2 AS dbl FROM {{payload}}",
      Some("v % 2 = 0"), None))
    e.register(WebhookConfig("/agg", "https://sink.invalid/x",
      "SELECT v FROM {{payload}} LIMIT 1", None, None))
    val ingest = new StreamIngest(e)

    def run(path: String, n: Int, label: String): Double = {
      val batch = (1 to n).map(i => path -> s"""{"v": $i}""")
        .toDF("source_path", "payload")
      // warm the plan caches untimed, then time one full micro-batch
      ingest.processMicroBatch(
        (1 to 100).map(i => path -> s"""{"v": $i}""")
          .toDF("source_path", "payload"), s"warm|$label")
      val t0 = System.nanoTime()
      ingest.processMicroBatch(batch, s"timed|$label")
      val sec = (System.nanoTime() - t0) / 1e9
      val eps = n / sec
      println(f"[throughput] $label%-18s n=$n%6d wall=$sec%8.2fs -> $eps%9.0f events/s")
      eps
    }

    val proj = run("/proj", nProj, "set-oriented")
    val agg = run("/agg", nAgg, "per-event-fallback")
    println(f"[throughput] set-oriented channel advantage: ${proj / agg}%.0fx")
    // latency-bound regime: 2000 events → 1000 survivors, each delivery
    // sleeping latencyMs; sequential handoff would pay 1000 × latency
    delayMs = latencyMs
    val lat = run("/proj", 2000, s"latency-${latencyMs}ms")
    println(f"[throughput] latency-bound: ${lat}%.0f events/s vs " +
      f"${1000.0 / latencyMs}%.0f events/s sequential bound")
    spark.stop()
  }
}
