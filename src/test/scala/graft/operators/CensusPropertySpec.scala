package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.SparkSpec

/** Property pins for the r12 census operators: the closed-form /
  * collapsed-table spellings must equal brute-force reference
  * computations on arbitrary inputs, and must be partition-invariant
  * (same rows at any parallelism — the determinism contract every
  * gated value relies on).
  */
class CensusPropertySpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  /** Deterministic pseudo-random samples (fixed seeds — property tests
    * here must be reproducible across runs, the repo-wide rule).
    */
  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(20), Seed(seed + i)))

  test("tokenGini: closed-form rank sums equal the textbook sorted-rank " +
    "Gini on random corpora") {
    val countsGen = Gen.nonEmptyListOf(Gen.choose(0, 40))
    for ((counts, si) <- samples(countsGen, 8, 4242L).zipWithIndex) {
      val docs = counts.zipWithIndex.map { case (c, i) =>
        (i.toLong, Seq.fill(c)("w").mkString(" "), s"src$si")
      }.toDF("doc_id", "text", "source")
      val out = TextAnalysis.tokenGini(docs).collect().head
      // brute force: G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx), x ascending
      val xs = counts.map(_.toLong).sorted
      val n = xs.length.toLong
      val sx = xs.sum
      val r = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      if (sx == 0L) assert(out.isNullAt(3))
      else {
        val expected = (2.0 * r - (n + 1) * sx) / (n.toDouble * sx)
        assert(out.getDouble(3) == expected,
          s"seed $si: ${out.getDouble(3)} vs $expected over $counts")
      }
    }
  }

  test("powerUserShare: value-run slicing equals brute-force sorted " +
    "user ranking on random activity") {
    val countsGen = Gen.nonEmptyListOf(Gen.choose(1, 12))
    for ((counts, si) <- samples(countsGen, 8, 777L).zipWithIndex) {
      val ev = counts.zipWithIndex.flatMap { case (c, u) =>
        (0 until c).map(j => (u * 1000L + j, j * 1000000000L, u.toLong, "e"))
      }.toDF("event_id", "ts", "user_id", "event_type")
      val out = EventFunnel.powerUserShare(ev).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(3), r.getLong(4))))
        .toMap
      val sorted = counts.map(_.toLong).sortBy(-_)
      val total = sorted.sum
      for (pct <- Seq(1, 10, 50)) {
        val k = (sorted.length * pct + 99) / 100
        val covered = sorted.take(k).sum
        assert(out(pct.toLong) ==
          ((k.toLong, covered, covered * 1000000L / total)),
          s"seed $si pct $pct over $counts")
      }
    }
  }

  test("new censuses are partition-invariant (1 vs 7 partitions)") {
    val docs = samples(Gen.choose(0, 30), 40, 99L).zipWithIndex.map {
      case (c, i) =>
        (i.toLong, Seq.tabulate(c)(j => s"w${(i + j) % 11}").mkString(" "),
          s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val ev = samples(Gen.choose(0, 50), 120, 55L).zipWithIndex.map {
      case (d, i) =>
        (i.toLong, d.toLong * 86400L * 1000000000L + i, (i % 13).toLong,
          s"t${i % 4}")
    }.toDF("event_id", "ts", "user_id", "event_type")
    def invariant(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
        src: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val a = f(src.repartition(1)).collect().toSeq
      val b = f(src.repartition(7)).collect().toSeq
      assert(a == b, what)
    }
    invariant(TextAnalysis.tokenGini, docs, "tokenGini")
    invariant(TextAnalysis.sourceDrift, docs, "sourceDrift")
    invariant(Dedup.dupSpreadCensus, docs, "dupSpreadCensus")
    invariant(EventFunnel.typeAffinity(_), ev, "typeAffinity")
    invariant(EventFunnel.weeklySeasonality, ev, "weeklySeasonality")
    invariant(EventFunnel.rollingActive(_), ev, "rollingActive")
    invariant(EventFunnel.powerUserShare(_), ev, "powerUserShare")
    invariant(EventFunnel.seasonalAnomalies, ev, "seasonalAnomalies")
    invariant(TextAnalysis.exclusiveVocab, docs, "exclusiveVocab")
    invariant(TextAnalysis.lengthPercentiles, docs, "lengthPercentiles")
    invariant(Dedup.crossSourceDupMatrix, docs, "crossSourceDupMatrix")
    val embs = samples(Gen.choose(-100, 100), 60, 31L).zipWithIndex.map {
      case (b, i) =>
        (i.toLong, Array.tabulate(5)(d => (b + d * i).toFloat / 64f),
          i % 4)
    }.toDF("vec_id", "embedding", "label")
    invariant(Similarity.centroidShift, embs, "centroidShift")
    invariant(Similarity.normBands, embs, "normBands")
    val evv = samples(Gen.choose(1, 5000), 90, 77L).zipWithIndex.map {
      case (c, i) =>
        (i.toLong, i * 1000000000L, (i % 9).toLong, s"t${i % 3}",
          c.toDouble / 100, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    invariant(EventFunnel.valuePercentiles, evv, "valuePercentiles")
  }

  test("lengthPercentiles: rank arithmetic equals brute-force sorted " +
    "nearest-rank percentiles on random lengths") {
    val countsGen = Gen.nonEmptyListOf(Gen.choose(0, 40))
    for ((lens, si) <- samples(countsGen, 8, 4242L).zipWithIndex) {
      val docs = lens.zipWithIndex.map { case (c, i) =>
        (i.toLong, Seq.fill(c)("w").mkString(" "), "s")
      }.toDF("doc_id", "text", "source")
      val out = TextAnalysis.lengthPercentiles(docs).collect().head
      val sorted = lens.map(_.toLong).sorted
      val n = sorted.length
      def nearestRank(p: Int): Long = sorted((n * p + 99) / 100 - 1)
      assert((out.getLong(1), out.getLong(2), out.getLong(3),
        out.getLong(4), out.getLong(5), out.getLong(6)) ==
        ((n.toLong, sorted.head, sorted.last,
          nearestRank(50), nearestRank(90), nearestRank(99))),
        s"seed $si over $lens")
    }
  }
}
