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
  */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
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
