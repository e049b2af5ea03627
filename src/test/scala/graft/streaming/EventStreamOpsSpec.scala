package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.SparkSpec

/** Streaming-operator pins: watermarked windowed aggregation and
  * flatMapGroupsWithState sessionization driven from MemoryStream.
  */
class EventStreamOpsSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("watermarked tumbling-window aggregation emits finalized windows") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val src = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreamOps.windowedTypeCounts(src,
      watermark = "1 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(0), "click", 1.25), (2L, ts(2), "click", 2.50),
        (3L, ts(4), "view", 0.75))
      q.processAllAvailable()
      // advance event time far past the first window + watermark
      mem.addData((4L, ts(20), "click", 1.00))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .orderBy("window_start", "event_type").collect()
      // the 00:00-00:05 window is finalized: click n=2 total=3.75, view n=1
      assert(rows.length >= 2)
      val click = rows.find(_.getString(1) == "click").get
      assert(click.getLong(2) == 2)
      assert(math.abs(click.getDouble(3) - 3.75) < 1e-9)
      val view = rows.find(_.getString(1) == "view").get
      assert(view.getLong(2) == 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes on gap") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[EventStreamOps.Ev]
    val q = EventStreamOps.sessionize(mem.toDS(), gapSec = 600)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: burst at 00:00-00:02, then a 20-min gap, then one more
      mem.addData(
        EventStreamOps.Ev(1, ts(0), 1L),
        EventStreamOps.Ev(2, ts(1), 1L),
        EventStreamOps.Ev(3, ts(2), 1L))
      q.processAllAvailable()
      mem.addData(EventStreamOps.Ev(4, ts(22), 1L)) // gap > 600s closes s1
      q.processAllAvailable()
      val sessions = spark.table("sess_out").orderBy("startSec").collect()
      assert(sessions.length == 1) // first session closed by the gap
      assert(sessions.head.getLong(3) == 3) // n_events
      assert(sessions.head.getLong(2) - sessions.head.getLong(1) == 120)
    } finally q.stop()
  }

  test("streaming attribution: cross-batch out-of-order first touch " +
    "replaces, conversions accumulate") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[EventStreamOps.TEv]
    val q = EventStreamOps.attribution(mem.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        EventStreamOps.TEv(10, ts(10), 1L, "view"),
        EventStreamOps.TEv(11, ts(11), 1L, "purchase"))
      q.processAllAvailable()
      val b1 = spark.table("attr_out").collect()
      assert(b1.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq == Seq((1L, "view", 1L)))
      // batch 2: an OLDER event (signup at t=5) arrives late — the
      // first touch must flip; a second conversion accumulates
      mem.addData(
        EventStreamOps.TEv(5, ts(5), 1L, "signup"),
        EventStreamOps.TEv(12, ts(12), 1L, "purchase"))
      q.processAllAvailable()
      val last = spark.table("attr_out").collect().last
      assert((last.getLong(0), last.getString(1), last.getLong(2)) ==
        ((1L, "signup", 2L)))
    } finally q.stop()
  }

  test("streaming attribution: pre-1970 sub-second timestamps use floor " +
    "semantics (same total order as batch epochSec)") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[EventStreamOps.TEv]
    val q = EventStreamOps.attribution(mem.toDS())
      .writeStream.format("memory").queryName("attr_pre_epoch")
      .outputMode(OutputMode.Update()).start()
    try {
      // signup at −500 ms floors to sec −1, BEFORE the click at sec 0.
      // Truncation-toward-zero would put both at sec 0 and the id
      // tie-break (1 < 2) would flip the first touch to "click".
      mem.addData(
        EventStreamOps.TEv(2, new Timestamp(-500L), 1L, "signup"),
        EventStreamOps.TEv(1, new Timestamp(0L), 1L, "click"))
      q.processAllAvailable()
      val last = spark.table("attr_pre_epoch").collect().last
      assert((last.getLong(0), last.getString(1)) == ((1L, "signup")))
    } finally q.stop()
  }

  test("streaming rolling-active deltas: cross-batch dedup of credited " +
    "days; aggregated deltas equal the batch operator") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val D = 86400L * 1000L // one epoch day in Timestamp millis
    val mem = MemoryStream[EventStreamOps.Ev]
    val q = EventStreamOps.rollingActiveDeltas(mem.toDS())
      .writeStream.format("memory").queryName("roll_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: u1 day 0 (two events — same day credits once), u2 day 1
      mem.addData(
        EventStreamOps.Ev(1, new Timestamp(0L), 1L),
        EventStreamOps.Ev(2, new Timestamp(10L), 1L),
        EventStreamOps.Ev(3, new Timestamp(D), 2L))
      q.processAllAvailable()
      // batch 2: u1 AGAIN on day 0 (no new credit) and on day 8
      mem.addData(
        EventStreamOps.Ev(4, new Timestamp(5L), 1L),
        EventStreamOps.Ev(5, new Timestamp(8 * D), 1L))
      q.processAllAvailable()
      val rolled = spark.table("roll_out")
        .groupBy("day")
        .agg(org.apache.spark.sql.functions.sum("delta").as("rolling_active"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // batch operator on the same events (span-trims at day 8)
      val ev = Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, D * 1000000L, 2L),
        (4L, 0L, 1L), (5L, 8L * D * 1000000L, 1L))
        .toDF("event_id", "ts", "user_id")
      val batch = graft.operators.EventFunnel.rollingActive(ev)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      batch.foreach { case (day, n) => assert(rolled(day) == n,
        s"day $day: stream ${rolled(day)} vs batch $n") }
      // untrimmed tail: u1's day-8 window extends past the batch span
      assert(rolled(14L) == 1L)
    } finally q.stop()
  }

  test("streaming value-percentile bands: latest row per type equals " +
    "the batch operator at every stream prefix") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[EventStreamOps.VEv]
    val q = EventStreamOps.valuePercentileUpdates(mem.toDS())
      .writeStream.format("memory").queryName("vp_out")
      .outputMode(OutputMode.Append()).start()
    def latest(): Map[String, (Long, Long, Long, Long, Long, Long)] = {
      // n_events only grows per type, so the latest emission is the
      // max-n row — no reliance on the memory sink's append order
      spark.table("vp_out").collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))))
        .groupBy(_._1).map { case (t, rows) =>
          t -> rows.map(_._2).maxBy(_._1)
        }
    }
    def batchOf(rows: Seq[(String, Double)])
        : Map[String, (Long, Long, Long, Long, Long, Long)] = {
      val ev = rows.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, i.toLong, 1L, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      graft.operators.EventFunnel.valuePercentiles(ev).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    }
    try {
      val b1 = Seq(("a", 1.00), ("a", 2.50), ("a", 2.50), ("b", 0.10))
      mem.addData(b1.map { case (t, v) => EventStreamOps.VEv(t, v) }: _*)
      q.processAllAvailable()
      assert(latest() == batchOf(b1), "prefix 1")
      // batch 2: out-of-order low value for a, new type c
      val b2 = Seq(("a", 0.05), ("c", 9.99), ("a", 2.50))
      mem.addData(b2.map { case (t, v) => EventStreamOps.VEv(t, v) }: _*)
      q.processAllAvailable()
      assert(latest() == batchOf(b1 ++ b2), "prefix 2")
    } finally q.stop()
  }

  test("foldCents capped rebin is the floor key even at Long.MaxValue " +
    "(wrap-safe; value-identical to the linear-scan spelling)") {
    // reference spelling: nearest existing key BELOW c, else current min
    def linearRef(m: Map[Long, Long], c: Long, cap: Int): Long =
      if (m.contains(c) || m.size < cap) c
      else m.keys.filter(_ <= c).maxOption.getOrElse(m.keys.min)
    val full = Map(10L -> 1L, 20L -> 1L, 30L -> 1L) // cap 3 = bound
    for (c <- Seq(5L, 10L, 15L, 29L, 31L, Long.MaxValue - 1, Long.MaxValue)) {
      val key = linearRef(full, c, 3)
      val folded = EventStreamOps.foldCents(full, Iterator(c), 3)
      assert(folded(key) == full.getOrElse(key, 0L) + 1L,
        s"c=$c expected rebin to $key, got $folded")
      assert(folded.values.sum == full.values.sum + 1L, s"c=$c lost a count")
    }
    // the r15 ADVICE divergence: c == Long.MaxValue (Infinity saturating
    // toLong) must rebin to the LARGEST key, not wrap to the minimum
    assert(EventStreamOps.foldCents(full, Iterator(Long.MaxValue), 3)
      .apply(30L) == 2L)
    // below-cap and existing-key arrivals never rebin
    assert(EventStreamOps.foldCents(Map(1L -> 1L), Iterator(9L), 3) ==
      Map(1L -> 1L, 9L -> 1L))
  }

  test("streaming dedup drops within-watermark duplicate event ids") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val src = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreamOps.dedupWithinWatermark(src, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(0), "click", 1.0), (2L, ts(1), "view", 2.0))
      q.processAllAvailable()
      // replay of id 1 in a later micro-batch (at-least-once source) and
      // an in-batch duplicate of id 2 — both must be dropped
      mem.addData((1L, ts(2), "click", 1.0), (2L, ts(2), "view", 2.0),
        (3L, ts(3), "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("file-source stream: parquet drops flow through the same operators") {
    // the at-scale ingestion mode: event files landing in a directory
    // (object store at 100 TB), discovered incrementally by readStream
    // with a checkpoint. Same operator code as MemoryStream/batch.
    val s = spark
    import s.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("evt-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evt-ck").toString
    Seq((1L, ts(0), "click", 1.25), (2L, ts(2), "click", 2.50))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(inDir)
    val src = s.readStream
      .schema("event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(inDir)
    val q = EventStreamOps.windowedTypeCounts(src,
      watermark = "1 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("file_win_out")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // a second file lands; its far-future event time finalizes the
      // first window past the watermark
      Seq((3L, ts(20), "view", 0.75))
        .toDF("event_id", "ts", "event_type", "value")
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val rows = s.table("file_win_out").collect()
      val click = rows.find(_.getString(1) == "click").get
      assert(click.getLong(2) == 2)
      assert(math.abs(click.getDouble(3) - 3.75) < 1e-9)
    } finally q.stop()
  }

  test("the same windowed aggregation runs unchanged in batch mode") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      (1L, ts(0), "click", 1.25), (2L, ts(2), "click", 2.50),
      (3L, ts(7), "view", 0.75))
      .toDF("event_id", "ts", "event_type", "value")
    val out = EventStreamOps.windowedTypeCounts(batch)
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 2) // two 5-min windows
    assert(out.head.getLong(2) == 2)
  }

  test("streaming KS drift: finisher over latest histograms equals the " +
    "batch operator at every stream prefix") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[EventStreamOps.VEv]
    val q = EventStreamOps.ksHistUpdates(mem.toDS())
      .writeStream.format("memory").queryName("ks_out")
      .outputMode(OutputMode.Append()).start()
    def streamed(): Seq[(String, String, Long, Long, Long)] = {
      // n_events only grows per type → the latest emission is the max-n
      // row (no reliance on the memory sink's append order)
      val latest = spark.table("ks_out").as[EventStreamOps.TypeHist]
        .collect().groupBy(_.event_type)
        .map { case (_, rows) => rows.maxBy(_.n_events) }.toSeq
      EventStreamOps.ksFromHists(latest)
        .map(k => (k.type_a, k.type_b, k.n_a, k.n_b, k.ks_ppm))
    }
    def batchOf(rows: Seq[(String, Double)])
        : Seq[(String, String, Long, Long, Long)] = {
      val ev = rows.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, i.toLong, 1L, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      graft.operators.EventFunnel.ksValueDrift(ev).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    }
    try {
      val b1 = Seq(("a", 1.00), ("a", 2.50), ("b", 0.10), ("b", 2.50))
      mem.addData(b1.map { case (t, v) => EventStreamOps.VEv(t, v) }: _*)
      q.processAllAvailable()
      assert(streamed() == batchOf(b1), "prefix 1")
      // batch 2: a third type plus out-of-order values for both others
      val b2 = Seq(("c", 9.99), ("a", 0.05), ("b", 1.00), ("c", 0.10))
      mem.addData(b2.map { case (t, v) => EventStreamOps.VEv(t, v) }: _*)
      q.processAllAvailable()
      assert(streamed() == batchOf(b1 ++ b2), "prefix 2")
      // batch 3: only one type moves — the other types' latest rows
      // carry over and the pair matrix still matches the full prefix
      val b3 = Seq(("a", 2.50), ("a", 2.50))
      mem.addData(b3.map { case (t, v) => EventStreamOps.VEv(t, v) }: _*)
      q.processAllAvailable()
      assert(streamed() == batchOf(b1 ++ b2 ++ b3), "prefix 3")
    } finally q.stop()
  }

  test("streaming KS drift above the distinct-cents cap: fold-down " +
    "rebins onto the nearest lower key and the KS degrades, pinned") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[EventStreamOps.VEv]
    // cap = 3 distinct cents per type; type a exceeds it, type b stays
    // exact (5 distinct) — both see the SAME values, so the exact KS
    // is 0 and anything nonzero is pure cap-induced error.
    val q = EventStreamOps.ksHistUpdates(mem.toDS(), maxDistinctPerType = 3)
      .writeStream.format("memory").queryName("ks_cap_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // ONE a-event per micro-batch: fold-down depends on which keys
      // exist when the cap trips, so per-batch singletons make the
      // degradation deterministic. b stays single-valued (1 distinct
      // cent, under the cap) so only a's histogram degrades.
      val aVals = Seq(1.00, 2.00, 3.00, 2.50, 0.50)
      for (v <- aVals) {
        mem.addData(EventStreamOps.VEv("a", v), EventStreamOps.VEv("b", 2.50))
        q.processAllAvailable()
      }
      val latest = spark.table("ks_cap_out").as[EventStreamOps.TypeHist]
        .collect().groupBy(_.event_type)
        .map { case (_, rows) => rows.maxBy(_.n_events) }.toSeq
      val byType = latest.map(h => h.event_type -> h.hist).toMap
      // a filled its 3 slots with 100/200/300; then 250 folded to the
      // nearest LOWER key 200, and 50 (below every key) to the min 100
      assert(byType("a") == Map(100L -> 2L, 200L -> 2L, 300L -> 1L))
      assert(byType("b") == Map(250L -> 5L))
      // fold-down moved a's 250-mass below b's mass point at 250, so
      // the streamed KS reads 800000 ppm where the exact batch value
      // is 600000 — the documented capped-regime divergence, bounded
      // by folded_mass/n = 2/5 (here +200000 ppm)
      val ks = EventStreamOps.ksFromHists(latest)
      assert(ks == Seq(EventStreamOps.KsRow("a", "b", 5L, 5L, 800000L)))
      val ev = aVals.zipWithIndex.flatMap { case (v, i) => Seq(
        (2L * i, i.toLong, 1L, "a", v, "{}"),
        (2L * i + 1, i.toLong, 1L, "b", 2.50, "{}"))
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val exact = graft.operators.EventFunnel.ksValueDrift(ev).collect()
      assert(exact.length == 1 && exact.head.getLong(4) == 600000L)
    } finally q.stop()
  }
}
