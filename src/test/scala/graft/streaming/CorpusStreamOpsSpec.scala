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
}
