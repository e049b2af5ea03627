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
    invariant(Similarity.centroidPurity, embs, "centroidPurity")
    invariant(EventFunnel.burstinessCensus, ev, "burstinessCensus")
    val evv = samples(Gen.choose(1, 5000), 90, 77L).zipWithIndex.map {
      case (c, i) =>
        (i.toLong, i * 1000000000L, (i % 9).toLong, s"t${i % 3}",
          c.toDouble / 100, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    invariant(EventFunnel.valuePercentiles, evv, "valuePercentiles")
  }

  test("burstinessCensus: integer cross-multiplied VMR classes equal " +
    "brute-force float variance/mean on random daily counts") {
    // one user: list of (day, events-that-day)
    val userGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 20L), Gen.choose(1, 9)))
    for ((users, si) <- samples(Gen.nonEmptyListOf(userGen), 8, 191L)
        .zipWithIndex) {
      val ev = users.zipWithIndex.flatMap { case (days, u) =>
        days.zipWithIndex.flatMap { case ((day, c), j) =>
          (0 until c).map(k =>
            (u * 100000L + j * 100 + k,
              day * 86400L * 1000000000L + k, u.toLong, "e"))
        }
      }.toDF("event_id", "ts", "user_id", "event_type")
      // brute force with plain floats (tiny counts: exact enough to
      // agree with the integer cross-multiplication on strict >)
      val expected = users.map { days =>
        val daily = days.groupBy(_._1).view.mapValues(_.map(_._2).sum)
          .values.map(_.toLong).toSeq
        val n = daily.size
        if (n == 1) ("single-day", daily.sum)
        else {
          val mean = daily.sum.toDouble / n
          val varP = daily.map(x => (x - mean) * (x - mean)).sum / n
          (if (varP > mean) "bursty" else "steady", daily.sum)
        }
      }.groupBy(_._1).view.mapValues { us =>
        (us.size.toLong, us.map(_._2).sum)
      }.toSeq.sortBy(_._1).map { case (cls, (nu, ne)) =>
        (cls, nu, ne, nu * 1000000L / users.size)
      }
      val got = EventFunnel.burstinessCensus(ev).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == expected, s"seed $si: $got vs $expected")
    }
  }

  test("centroidPurity: broadcast-forall cross-multiplication equals " +
    "brute-force BigInt nearest-centroid on random vectors") {
    val vecGen = Gen.zip(Gen.choose(0, 2),
      Gen.listOfN(4, Gen.choose(-1000, 1000)))
    for ((vecs0, si) <- samples(Gen.nonEmptyListOf(vecGen), 8, 192L)
        .zipWithIndex) {
      // ensure >= 2 labels so the oracle-shaped semantics are non-vacuous
      val vecs = vecs0 ++ List((0, List(1, 2, 3, 4)), (1, List(5, 6, 7, 8)))
      val embs = vecs.zipWithIndex.map { case ((l, xs), i) =>
        (i.toLong, xs.map(_.toFloat / 512f).toArray, l)
      }.toDF("vec_id", "embedding", "label")
      def q(f: Float): Long =
        math.floor(f.toDouble * 1000000 + 0.5).toLong
      val quant = vecs.map { case (l, xs) =>
        (l, xs.map(x => q(x.toFloat / 512f)))
      }
      val byLabel = quant.groupBy(_._1).view.mapValues { vs =>
        val n = vs.size.toLong
        val sums = vs.map(_._2).transpose.map(_.sum)
        (n, sums)
      }.toMap
      def d2(xq: List[Long], l: Int): BigInt = {
        val (n, s) = byLabel(l)
        xq.zip(s).map { case (x, sv) =>
          BigInt(n * x - sv) * (n * x - sv)
        }.sum
      }
      val expected = quant.map { case (a, xq) =>
        val (na, _) = byLabel(a)
        val da = d2(xq, a)
        val pure = byLabel.keys.forall { b =>
          b == a || {
            val (nb, _) = byLabel(b)
            da * nb * nb <= d2(xq, b) * na * na
          }
        }
        (a, pure)
      }.groupBy(_._1).view.mapValues { ps =>
        (ps.size.toLong, ps.count(_._2).toLong)
      }.toSeq.sortBy(_._1).map { case (l, (nv, np)) =>
        (l, nv, np, np * 1000000L / nv)
      }
      val got = Similarity.centroidPurity(embs).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == expected, s"seed $si: $got vs $expected")
    }
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

  // ---- r13 batch-2 censuses -------------------------------------------

  /** Random (user, secs) event frames for the gap/session pins. */
  private def gapEvents(si: Int): Seq[(Long, Long, Long, String)] = {
    val userGen = Gen.nonEmptyListOf(Gen.choose(0L, 200000L))
    samples(Gen.nonEmptyListOf(userGen), 1, 3000L + si).head
      .zipWithIndex.flatMap { case (secs, u) =>
        secs.zipWithIndex.map { case (sec, j) =>
          (u * 100000L + j, sec * 1000000000L, u.toLong, "e")
        }
      }
  }

  test("gapBandCensus: per-user array gaps equal brute-force sorted " +
    "diffs on random timelines") {
    for (si <- 0 until 8) {
      val rows = gapEvents(si)
      val ev = rows.toDF("event_id", "ts", "user_id", "event_type")
      def band(g: Long): String =
        if (g < 60) "a_lt_1m" else if (g < 3600) "b_1m_1h"
        else if (g < 86400) "c_1h_1d" else "d_ge_1d"
      val gaps = rows.groupBy(_._3).values.toSeq.flatMap { us =>
        val s = us.map(_._2 / 1000000000L).sorted
        s.zip(s.drop(1)).map { case (a, b) => b - a }
      }
      val expected = gaps.groupBy(band).view
        .mapValues(_.size.toLong).toSeq.sorted
        .map { case (b, n) => (b, n, n * 1000000L / gaps.size) }
      val got = EventFunnel.gapBandCensus(ev).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"seed $si: $got vs $expected")
    }
  }

  test("sessionDepthCensus: in-array boundary slicing equals brute-force " +
    "session splitting on random timelines") {
    for (si <- 0 until 8) {
      val rows = gapEvents(si)
      val ev = rows.toDF("event_id", "ts", "user_id", "event_type")
      def band(n: Int): String =
        if (n == 1) "a_1" else if (n <= 3) "b_2_3" else if (n <= 7) "c_4_7"
        else if (n <= 15) "d_8_15" else "e_16_plus"
      val sizes = rows.groupBy(_._3).values.toSeq.flatMap { us =>
        val s = us.map(_._2 / 1000000000L).sorted
        // explicit split: walk sorted secs, cut where gap > 1800
        val sess = scala.collection.mutable.ListBuffer(
          scala.collection.mutable.ListBuffer(s.head))
        s.sliding(2).foreach {
          case Seq(a, b) =>
            if (b - a > 1800) sess += scala.collection.mutable.ListBuffer(b)
            else sess.last += b
          case _ =>
        }
        sess.map(_.size).toSeq
      }
      val expected = sizes.groupBy(band).view
        .mapValues(ss => (ss.size.toLong, ss.map(_.toLong).sum)).toSeq
        .sortBy(_._1).map { case (b, (ns, ne)) =>
          (b, ns, ne, ns * 1000000L / sizes.size)
        }
      val got = EventFunnel.sessionDepthCensus(ev).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == expected, s"seed $si: $got vs $expected")
    }
  }

  test("ksValueDrift: cross-multiplied max-CDF-gap equals brute-force " +
    "BigInt KS on random two-type value streams") {
    val evGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 3), Gen.choose(1, 400)))
    for ((evs, si) <- samples(evGen, 8, 1913L).zipWithIndex) {
      val rows = evs.zipWithIndex.map { case ((t, cents), i) =>
        (i.toLong, i * 1000000000L, (i % 5).toLong, s"t$t",
          cents.toDouble / 100, "{}")
      }
      val ev = rows.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props")
      val byType = evs.groupBy(t => s"t${t._1}").view
        .mapValues(_.map(_._2.toLong)).toMap
      val types = byType.keys.toSeq.sorted
      val expected = (for {
        i <- types.indices; j <- (i + 1) until types.length
      } yield {
        val (ta, tb) = (types(i), types(j))
        val (xa, xb) = (byType(ta), byType(tb))
        val (na, nb) = (xa.size.toLong, xb.size.toLong)
        val axis = (xa ++ xb).distinct.sorted
        val ks = axis.map { v =>
          val cuma = xa.count(_ <= v).toLong
          val cumb = xb.count(_ <= v).toLong
          (BigInt(cuma) * nb - BigInt(cumb) * na).abs
        }.max
        (ta, tb, na, nb, (ks * 1000000 / (BigInt(na) * nb)).toLong)
      }).sortBy(r => (r._1, r._2))
      val got = EventFunnel.ksValueDrift(ev).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(got == expected, s"seed $si: $got vs $expected")
    }
  }

  test("cosineBandCensus: sqrt-free integer banding equals brute-force " +
    "double cosine on random vectors (away from band boundaries)") {
    val vecGen = Gen.listOfN(6, Gen.choose(-1000, 1000))
    for ((vecs, si) <- samples(Gen.nonEmptyListOf(vecGen), 8, 555L)
        .zipWithIndex) {
      val embs = vecs.zipWithIndex.map { case (xs, i) =>
        (i.toLong, xs.map(_.toFloat / 1024f).toArray, 0)
      }.toDF("vec_id", "embedding", "label")
      def q(xs: List[Int]): List[Long] =
        xs.map(x => math.floor((x.toFloat / 1024f).toDouble * 1000000 + 0.5)
          .toLong)
      val quant = vecs.map(q)
      def band(qa: List[Long], qb: List[Long]): String = {
        val dot = qa.zip(qb).map { case (x, y) => BigInt(x) * y }.sum
        val nanb = BigInt(qa.map(x => BigInt(x) * x).sum.toString) *
          qb.map(x => BigInt(x) * x).sum
        if (nanb == 0) "z_zero"
        else if (dot < 0) "a_neg"
        else if (dot * dot * 16 < nanb) "b_lt_25"
        else if (dot * dot * 4 < nanb) "c_25_50"
        else if (dot * dot * 16 < nanb * 9) "d_50_75"
        else "e_ge_75"
      }
      val pairs = for {
        a <- vecs.indices; b <- vecs.indices
        if a % 7 == 0 && b % 11 == 0 && a < b
      } yield band(quant(a), quant(b))
      if (pairs.nonEmpty) {
        val expected = pairs.groupBy(identity).view
          .mapValues(_.size.toLong).toSeq.sorted
          .map { case (b, n) => (b, n, n * 1000000L / pairs.size) }
        val got = Similarity.cosineBandCensus(embs).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == expected, s"seed $si: $got vs $expected")
      }
    }
  }

  test("cosineBandCensus: adaptive default equals explicit mods past " +
    "the 7/11 floor (the routing the pinned q199 gate does not cover)") {
    // 12k vectors puts cosineBandPlan past the published floor, so the
    // default arm actually exercises the scale-adaptive mods.
    val n = 12000
    val embs = spark.range(n).selectExpr("id AS vec_id",
      "array(CAST((id % 97) AS FLOAT) / 97, CAST((id % 31) AS FLOAT) / 31," +
        " CAST((id % 7) AS FLOAT) / 7) AS embedding", "0 AS label")
    val (ma, mb) = Similarity.cosineBandPlan(n.toLong)
    assert(ma > 7 && mb > 11, s"plan must leave the floor: ($ma, $mb)")
    val adaptive = Similarity.cosineBandCensus(embs).collect().toSeq
    val explicit = Similarity.cosineBandCensus(embs, ma, mb).collect().toSeq
    assert(adaptive == explicit)
  }

  test("cosineBandCensus: decimal accumulators survive magnitudes that " +
    "wrap an int64 sum of squares (the silent-wrong-band ADVICE case)") {
    // raw (2190, 2190) quantizes to (2.19e9, 2.19e9); the norm² sum
    // 2·(2.19e9)² = 9.59e18 exceeds Long.MaxValue (9.22e18) — a BIGINT
    // aggregate wraps it NEGATIVE, na·nb goes negative, every band
    // inequality fails and the orthogonal pair silently misbands as
    // e_ge_75. DECIMAL(38,0) accumulation keeps it exact (band products
    // stay < 1e38 here; magnitudes beyond THAT error loudly under ANSI
    // instead of wrapping, matching the oracle's HUGEINT behavior).
    val embs = Seq(
      (0L, Array(2190f, 2190f), 0),
      (11L, Array(1f, -1f), 0),
      (22L, Array(-2190f, -2190f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.cosineBandCensus(embs, 1, 11).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // (0,11) and (11,22) orthogonal → b_lt_25; (0,22) opposite → a_neg
    assert(got == Map("b_lt_25" -> 2L, "a_neg" -> 1L), got.toString)
  }

  test("cosineBandPlan: fixed calibration budget at any corpus size") {
    // small corpora keep the published 7/11 sample
    assert(Similarity.cosineBandPlan(50L) == ((7, 11)))
    assert(Similarity.cosineBandPlan(500L) == ((7, 11)))
    // large corpora bound the expected sample sizes (the quadratic
    // pair count stays ~1.3M at ANY scale)
    for (n <- Seq(10000L, 100000L, 10000000L, 1000000000L)) {
      val (ma, mb) = Similarity.cosineBandPlan(n)
      assert(n / ma <= 1400 && n / mb <= 900, s"budget at n=$n: ($ma, $mb)")
    }
  }

  test("r13 batch-2 censuses are partition-invariant (1 vs 7 partitions)") {
    val ev = gapEvents(0).toDF("event_id", "ts", "user_id", "event_type")
    val evv = samples(Gen.choose(1, 5000), 90, 77L).zipWithIndex.map {
      case (c, i) =>
        (i.toLong, i * 1000000000L, (i % 9).toLong, s"t${i % 3}",
          c.toDouble / 100, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val embs = samples(Gen.choose(-100, 100), 60, 31L).zipWithIndex.map {
      case (b, i) =>
        (i.toLong, Array.tabulate(5)(d => (b + d * i).toFloat / 64f),
          i % 4)
    }.toDF("vec_id", "embedding", "label")
    def invariant(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
        src: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val a = f(src.repartition(1)).collect().toSeq
      val b = f(src.repartition(7)).collect().toSeq
      assert(a == b, what)
    }
    invariant(EventFunnel.gapBandCensus, ev, "gapBandCensus")
    invariant(EventFunnel.sessionDepthCensus(_), ev, "sessionDepthCensus")
    invariant(EventFunnel.ksValueDrift, evv, "ksValueDrift")
    invariant(Similarity.cosineBandCensus(_), embs, "cosineBandCensus")
  }
}
