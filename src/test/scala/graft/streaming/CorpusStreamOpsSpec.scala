package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.SparkSpec
import graft.operators.Dedup

/** Streaming near-dup candidate pins: the per-row MinHash matches the
  * batch signature bit-for-bit, and the stateful bucket detector
  * surfaces cross-batch candidates exactly like within-batch ones.
  */
class CorpusStreamOpsSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("minhashPerRow equals the batch minhash signature exactly") {
    val d = docsDf(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "one two three four five six seven",
      4L -> "short one", // < 3 tokens: no signature rows
      5L -> "repeat repeat repeat repeat")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "band").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows(Dedup.minhashPerRow(d)) == rows(Dedup.minhash(d)))
    assert(Dedup.minhashPerRow(d).where(col("doc_id") === 4L).count() == 0)
  }

  test("streaming candidates surface within-batch and cross-batch pairs") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val mem = MemoryStream[CorpusStreamOps.DocIn]
    val q = CorpusStreamOps.nearDupCandidates(mem.toDS())
      .writeStream.format("memory").queryName("cand_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: 1 and 2 are identical (collide on all 8 bands); 3 is
      // unrelated and must stay silent
      mem.addData(
        CorpusStreamOps.DocIn(1L, "alpha beta gamma delta epsilon"),
        CorpusStreamOps.DocIn(2L, "alpha beta gamma delta epsilon"),
        CorpusStreamOps.DocIn(3L, "one two three four five six"))
      q.processAllAvailable()
      val b1 = s.table("cand_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(b1.distinct == Seq((2L, 1L))) // one pair, every band
      assert(b1.size == 8)

      // batch 2: another copy arrives later -> candidates against BOTH
      // stored members (cross-batch state), larger id pairs first-seen
      mem.addData(CorpusStreamOps.DocIn(4L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      val all = s.table("cand_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert((all.diff(b1)).distinct.sorted == Seq((4L, 1L), (4L, 2L)))
      assert(all.size == 24) // 8 + 2 * 8

      // re-delivery of a stored id is a no-op (at-least-once source)
      mem.addData(CorpusStreamOps.DocIn(2L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      assert(s.table("cand_out").count() == 24)
    } finally q.stop()
  }

  test("streaming cosQ equals the batch CosineSimQ expression exactly") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val vs = Seq(
      (Seq(0.3f, -0.7f, 0.21f, 0.001f), Seq(-0.11f, 0.55f, 0.9f, -0.33f)),
      (Seq(1f, 0f, 0f, 0f), Seq(1f, 0f, 0f, 0f)),
      (Seq(0.5f, 0.5f, 0.5f, 0.5f), Seq(-0.5f, 0.5f, -0.5f, 0.5f)))
    val batch = vs.toDF("a", "b")
      .select(graft.operators.Similarity.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    val stream = vs.map { case (a, b) => CorpusStreamOps.cosQ(a, b) }
    assert(batch == stream)
  }

  test("streaming semantic dedup flags cross-batch near-dups per cluster") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    // batch-train the quantizer on the same corpus shape the stream
    // will carry (two orthogonal neighborhoods)
    val trainEmb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Seq(0f, 0f, 1f, 0f), 1), (3L, Seq(0f, 0.1f, 0.9f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = CorpusStreamOps.collectCentroids(
      graft.operators.Similarity.trainedCentroids(trainEmb, k = 2,
        sampleN = 4, iters = 1))
    assert(cents.length == 2)

    val mem = MemoryStream[CorpusStreamOps.VecIn]
    val q = CorpusStreamOps.semanticDedupCandidates(mem.toDS(), cents,
        threshold = 0.9)
      .writeStream.format("memory").queryName("semdup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two orthogonal exemplars — nothing to flag
      mem.addData(
        CorpusStreamOps.VecIn(10L, Seq(1f, 0f, 0f, 0f)),
        CorpusStreamOps.VecIn(11L, Seq(0f, 0f, 1f, 0f)))
      q.processAllAvailable()
      assert(s.table("semdup_out").count() == 0)

      // batch 2: an identical copy of each exemplar arrives later →
      // flagged against the CROSS-BATCH state, in its own cluster
      mem.addData(
        CorpusStreamOps.VecIn(12L, Seq(1f, 0f, 0f, 0f)),
        CorpusStreamOps.VecIn(13L, Seq(0f, 0f, 1f, 0f)))
      q.processAllAvailable()
      val b2 = s.table("semdup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq.sorted
      assert(b2 == Seq((12L, 10L, 1.0), (13L, 11L, 1.0)))
      // the two flags sit in different clusters (blocking respected)
      assert(s.table("semdup_out").select("cluster").distinct().count() == 2)

      // batch 3: a matched vector did NOT join the exemplar set — a
      // third copy still matches the ORIGINAL representative; an
      // orthogonal-dimension vector joins silently as a new exemplar
      mem.addData(
        CorpusStreamOps.VecIn(14L, Seq(1f, 0f, 0f, 0f)),
        CorpusStreamOps.VecIn(15L, Seq(0f, 1f, 0f, 0f)))
      q.processAllAvailable()
      val b3 = s.table("semdup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(b3.contains((14L, 10L)) && !b3.exists(_._1 == 15L))
      assert(s.table("semdup_out").count() == 3)
    } finally q.stop()
  }

  test("streaming semantic dedup ties break to the smaller stored id " +
      "across batches") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    // one centroid → one cluster: every arrival shares the exemplar
    // list, so the tie-break (not the blocking) is what's under test
    val cents = Array((0, Array(1.0, 1.0, 0.0, 0.0)))
    val mem = MemoryStream[CorpusStreamOps.VecIn]
    val q = CorpusStreamOps.semanticDedupCandidates(mem.toDS(), cents,
        threshold = 0.5)
      .writeStream.format("memory").queryName("semdup_tie_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: id 10 becomes the first exemplar
      mem.addData(CorpusStreamOps.VecIn(10L, Seq(1f, 0f, 0f, 0f)))
      q.processAllAvailable()
      // batch 2: SMALLER id 5, orthogonal to 10 (cos 0 < 0.5) → joins
      // the exemplar list AFTER 10 — insertion order now disagrees
      // with id order, the case the explicit (c, rid) update covers
      mem.addData(CorpusStreamOps.VecIn(5L, Seq(0f, 1f, 0f, 0f)))
      q.processAllAvailable()
      assert(s.table("semdup_tie_out").count() == 0)
      // batch 3: (1,1,0,0) ties EXACTLY between both exemplars by
      // symmetry of the quantized arithmetic (cos = 1/√2 each) →
      // the contract says match the smaller stored id, 5, even though
      // 10 was stored first
      mem.addData(CorpusStreamOps.VecIn(20L, Seq(1f, 1f, 0f, 0f)))
      q.processAllAvailable()
      val r = s.table("semdup_tie_out").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(r == Seq((20L, 5L)),
        s"tie must resolve to the smaller stored id: $r")
    } finally q.stop()
  }

  test("streaming decontamination flags near-bench arrivals statelessly") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val trainEmb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Seq(0f, 0f, 1f, 0f), 1), (3L, Seq(0f, 0.1f, 0.9f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = CorpusStreamOps.collectCentroids(
      graft.operators.Similarity.trainedCentroids(trainEmb, k = 2,
        sampleN = 4, iters = 1))
    // two bench exemplars in different semantic neighborhoods
    val bench = Array(
      (100L, Seq(1f, 0f, 0f, 0f)), (200L, Seq(0f, 0f, 1f, 0f)))

    val mem = MemoryStream[CorpusStreamOps.VecIn]
    val q = CorpusStreamOps.decontaminationFlags(mem.toDS(), cents, bench,
        threshold = 0.9)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        CorpusStreamOps.VecIn(10L, Seq(1f, 0f, 0f, 0f)),   // = bench 100
        CorpusStreamOps.VecIn(11L, Seq(0f, 0f, 0.98f, 0f)), // ≈ bench 200
        CorpusStreamOps.VecIn(12L, Seq(0f, 1f, 0f, 0f)))    // clean
      q.processAllAvailable()
      val flags = s.table("contam_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(flags == Seq((10L, 100L), (11L, 200L)))
      // the clean vector is absent, and the two flags came from the
      // arrival's OWN cluster (nprobe=1 probe discipline)
      assert(s.table("contam_out").select("cluster").distinct().count() == 2)
    } finally q.stop()
  }

  test("streaming chunk dedup flags cross-doc windows, never self/within") {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val mem = MemoryStream[CorpusStreamOps.DocIn]
    val q = CorpusStreamOps.chunkDupFlags(mem.toDS(), window = 3, stride = 2)
      .writeStream.format("memory").queryName("chunkdup_out")
      .outputMode(OutputMode.Append()).start()
    def rows() = s.table("chunkdup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    try {
      // batch 1: doc1 stores "a b c"/"c d e"/"e"; doc4's repeated
      // within-doc window ("z w z" at chunks 0 AND 1) must NOT flag
      mem.addData(
        CorpusStreamOps.DocIn(1L, "a b c d e"),
        CorpusStreamOps.DocIn(4L, "z w z w z w"))
      q.processAllAvailable()
      assert(rows() == Seq())

      // batch 2: doc2 reuses doc1's opening window only; doc3 is a
      // full duplicate of doc1 -> all three windows flag
      mem.addData(
        CorpusStreamOps.DocIn(2L, "a b c x y"),
        CorpusStreamOps.DocIn(3L, "a b c d e"))
      q.processAllAvailable()
      assert(rows() == Seq((2L, 0L, 3L), (3L, 0L, 3L), (3L, 1L, 3L),
        (3L, 2L, 1L)))

      // re-delivery of the stored holder doc is a no-op
      mem.addData(CorpusStreamOps.DocIn(1L, "a b c d e"))
      q.processAllAvailable()
      assert(rows().size == 4)
    } finally q.stop()
  }
}
