package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SparkSpec

/** Property pins for the round-10 operators: the chunkers against a
  * direct Scala reference (tokens → stride arithmetic → md5 prefix),
  * and the event-ledger identities growth accounting / stickiness must
  * satisfy on ANY input. Seeded generators in the
  * NativeExprPropertySpec style — deterministic and replayable.
  */
class ChunkPropertySpec extends AnyFunSuite {

  private def spark = SparkSpec.spark

  private def sample[T](gen: Gen[T], n: Int, seed: Long = 1733L): Seq[T] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(14), Seed(seed + i)))

  /** Tokens whose ROOT-locale lowercase is byte-stable across engines
    * (ASCII + fixed multibyte), so the reference tokenizer below is
    * exactly Spark's `lower` + single-space split + non-empty filter.
    */
  private val tokGen: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf("a", "b", "Z", "q", "M"),
      2 -> Gen.oneOf("0", "7"),
      2 -> Gen.oneOf("é", "中", "😀"),
      1 -> Gen.oneOf(".", "!"))).map(_.mkString))

  /** A doc is tokens joined by 1-3 spaces (plus optional edge blanks). */
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 17)
    toks <- Gen.listOfN(n, tokGen)
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.choose(1, 3))
    lead <- Gen.choose(0, 2)
    trail <- Gen.choose(0, 2)
  } yield " " * lead + toks.lazyZip(seps :+ 0)
    .map((t, s) => t + " " * s).mkString + " " * trail

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split(" ", -1).toSeq.filter(_.nonEmpty)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** hexToLong of the first 8 hex chars (the HexPrefixLong value). */
  private def hexPrefix(hex: String): Long =
    hex.take(8).foldLeft(0L)((acc, c) =>
      acc * 16 + "0123456789abcdef".indexOf(c))

  test("chunkTokens equals the direct reference for every (w, s) sweep") {
    val s = spark
    import s.implicits._
    val docs = sample(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    for (window <- Seq(1, 2, 3, 5); stride <- Seq(1, 2, 3, 5)
         if stride <= window) {
      val got = TextAnalysis.chunkTokens(df, window, stride).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      val want = docs.flatMap { case (id, text) =>
        val w = refTokens(text)
        (0 until w.length by stride).zipWithIndex.map { case (st, ci) =>
          val slice = w.slice(st, st + window)
          (id, ci.toLong, st.toLong, slice.length.toLong,
            hexPrefix(md5hex(slice.mkString(" "))))
        }
      }.sortBy(x => (x._1, x._2))
      assert(got == want, s"window=$window stride=$stride")
    }
  }

  test("chunkDedupCensus equals the brute-force reference census") {
    val s = spark
    import s.implicits._
    val docs = sample(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t, s"s${i % 4}") }
    val df = docs.toDF("doc_id", "text", "source")
    val (window, stride) = (3, 2)
    val chunks = docs.flatMap { case (_, text, src) =>
      val w = refTokens(text)
      (0 until w.length by stride).map { st =>
        val slice = w.slice(st, st + window)
        (src, md5hex(slice.mkString(" ")), slice.length.toLong)
      }
    }
    val want = chunks.groupBy(_._1).map { case (src, cs) =>
      val groups = cs.groupBy(_._2).values.toSeq
      val nChunks = cs.size.toLong
      val nDistinct = groups.size.toLong
      val tokMass = cs.map(_._3).sum
      val dup = groups.map(g => (g.size - 1) * g.head._3).sum
      (src, nChunks, nDistinct, tokMass, dup, dup * 1000000L / tokMass)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.chunkDedupCensus(df, window, stride).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }

  test("sourceNearDupMatrix: exact-duplicate groups are fully attributed") {
    val s = spark
    import s.implicits._
    // generated corpora of docs drawn from a small pool of >=3-token
    // texts: every exact-duplicate pair is a CERTAIN LSH capture
    // (identical signatures) with Jaccard 1, so the matrix must count
    // at least the per-source-pair exact-dup pairs; distinct pool
    // texts share no trigrams, so cross-text pairs cannot appear
    val pool = Vector(
      "alpha beta gamma delta epsilon", "zeta eta theta iota kappa",
      "lambda mu nu xi omicron", "pi rho sigma tau upsilon")
    val docsGen = Gen.choose(2, 14).flatMap(n => Gen.listOfN(n, for {
      t <- Gen.oneOf(pool.indices)
      src <- Gen.oneOf("A", "B", "C")
    } yield (t, src)))
    for ((docs, i) <- sample(docsGen, 10, seed = 555L).zipWithIndex) {
      val df = docs.zipWithIndex
        .map { case ((t, src), j) => (j.toLong, pool(t), src) }
        .toDF("doc_id", "text", "source")
      val got = Dedup.sourceNearDupMatrix(df).collect()
        .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
      val want = docs.zipWithIndex.combinations(2).toSeq
        .map { case Seq((a, _), (b, _)) => (a, b) }
        .filter { case ((ta, _), (tb, _)) => ta == tb }
        .groupBy { case ((_, sa), (_, sb)) =>
          if (sa <= sb) (sa, sb) else (sb, sa) }
        .map { case (k, v) => (k, v.size.toLong) }
      assert(got == want, s"sample $i: got $got want $want")
    }
  }

  test("sourceNearDupMatrix equals the uncollapsed pipeline's rollup") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{greatest, least}
    // pool with NEAR pairs (0~1 share 4 of 5 trigram positions) and
    // exact duplicates layered on by the generator — the collapsed
    // cross-group/within-group arithmetic must reproduce the direct
    // nearDupPairs -> source-join -> rollup on every corpus
    val pool = Vector(
      "alpha beta gamma delta epsilon zeta eta",
      "alpha beta gamma delta epsilon zeta NINE",
      "one two three four five six seven",
      "pi rho sigma tau upsilon phi chi")
    val docsGen = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, for {
      t <- Gen.oneOf(pool.indices)
      src <- Gen.oneOf("A", "B")
    } yield (t, src)))
    for ((docs, i) <- sample(docsGen, 8, seed = 777L).zipWithIndex) {
      val df = docs.zipWithIndex
        .map { case ((t, src), j) => (j.toLong, pool(t), src) }
        .toDF("doc_id", "text", "source")
      val got = Dedup.sourceNearDupMatrix(df).collect()
        .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
      val src = df.select(col("doc_id"), col("source"))
      val want = Dedup.nearDupPairs(df)
        .join(src.as("sa"), col("sa.doc_id") === col("a"))
        .join(src.as("sb"), col("sb.doc_id") === col("b"))
        .select(least(col("sa.source"), col("sb.source")).as("s1"),
          greatest(col("sa.source"), col("sb.source")).as("s2"))
        .groupBy("s1", "s2").count().collect()
        .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
      assert(got == want, s"sample $i")
    }
  }

  private val eventsGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      sec <- Gen.choose(0L, 4L * 604800L)
    } yield (u, sec))
  } yield evs

  test("growthAccounting: wau decomposes and flows balance on any input") {
    val s = spark
    import s.implicits._
    for ((evs, i) <- sample(eventsGen, 12).zipWithIndex) {
      val df = evs.zipWithIndex
        .map { case ((u, sec), j) => (j.toLong, sec, u) }
        .toDF("event_id", "sec", "user_id")
        .select(col("event_id"), expr("timestamp_seconds(sec)").as("ts"),
          col("user_id"))
      val r = EventFunnel.growthAccounting(df).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getLong(4), x.getLong(5)))
      // every active user is exactly one of new/retained/resurrected
      assert(r.forall(x => x._2 == x._3 + x._4 + x._5), s"sample $i: $r")
      // births sum to the distinct-user count
      assert(r.map(_._3).sum == evs.map(_._1).distinct.size, s"sample $i")
      // churn balances against the previous active week's WAU
      val churnOk = r.zip((0L, 0L, 0L, 0L, 0L, 0L) +: r.toSeq.init)
        .forall { case (cur, prev) => cur._6 == prev._2 - cur._4 }
      assert(churnOk, s"sample $i: $r")
    }
  }

  test("stickiness: bounds and exact ratio arithmetic on any input") {
    val s = spark
    import s.implicits._
    for ((evs, i) <- sample(eventsGen, 12, seed = 4099L).zipWithIndex) {
      val df = evs.zipWithIndex
        .map { case ((u, sec), j) => (j.toLong, sec, u) }
        .toDF("event_id", "sec", "user_id")
        .select(col("event_id"), expr("timestamp_seconds(sec)").as("ts"),
          col("user_id"))
      val r = EventFunnel.stickiness(df).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getLong(4)))
      for ((wk, days, sumDau, wau, ppm) <- r) {
        assert(days >= 1 && days <= 7, s"sample $i wk $wk")
        // each of wau users contributes 1..days actives
        assert(sumDau >= wau && sumDau <= days.min(7) * wau,
          s"sample $i wk $wk")
        assert(ppm == sumDau * 1000000L / (7L * wau), s"sample $i wk $wk")
      }
    }
  }
}
