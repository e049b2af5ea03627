package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SparkSpec
import graft.operators.Dedup

/** Property equivalence of the four native per-row expressions against
  * their SQL spellings (the hand-picked adversarial pins live in
  * DataPipelineSpec; this makes the value-identity claims mechanical
  * over generated UTF-8, whitespace classes, and parameter sweeps —
  * VERDICT r9 item 6). Seeded generators in the PayloadPropertySpec
  * style: deterministic, replayable, no scalacheck-scalatest bridge
  * needed.
  */
class NativeExprPropertySpec extends AnyFunSuite {

  private def spark = SparkSpec.spark

  /** Drive a generator with fixed seeds (deterministic, replayable). */
  private def sample[T](gen: Gen[T], n: Int, seed: Long = 977L): Seq[T] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(12), Seed(seed + i)))

  /** Text alphabet stressing every byte-length class and the \s
    * corner: ASCII letters/digits/punct, the six Java whitespace
    * chars incl. U+000B, 2-byte (é ü ß ñ), 3-byte (中 한 €), 4-byte
    * surrogate-pair emoji, and a combining mark.
    */
  private val unitGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaLowerChar.map(_.toString),
    3 -> Gen.alphaUpperChar.map(_.toString),
    3 -> Gen.numChar.map(_.toString),
    3 -> Gen.oneOf(".", ",", "!", "-", "(", ")", "*", "&", "#", "@"),
    4 -> Gen.oneOf(" ", "\t", "\n", "\r", "\f", ""),
    2 -> Gen.oneOf("é", "ü", "ß", "ñ"),
    2 -> Gen.oneOf("中", "한", "€"),
    1 -> Gen.oneOf("😀", "🚀"),
    // the two code points whose full lowercase involves an ASCII
    // letter (U+212A KELVIN → k, U+0130 İ → i+U+0307): the r11
    // classifier handles them byte-exact, so the property must hold
    // with them in the alphabet
    2 -> Gen.oneOf("K", "İ"),
    1 -> Gen.const("é"))

  private val textGen: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, unitGen).map(_.mkString))

  /** Token units exclude whitespace entirely (tokens are pre-split by
    * contract and never contain a space) but keep every byte-length
    * class; small alphabet forces duplicate shingles.
    */
  private val tokenGen: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf("a", "b", "c", "z", "q"),
      2 -> Gen.oneOf("0", "9"),
      2 -> Gen.oneOf("é", "中", "😀"),
      1 -> Gen.oneOf(".", "!"))).map(_.mkString))

  private val tokensGen: Gen[Seq[String]] =
    Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, tokenGen))

  test("token_run_count == regexp_count(lower, BPE pattern) over " +
      "generated UTF-8") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val texts = sample(textGen, 150)
    assert(texts.count(_.nonEmpty) > 100)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val r = d.select(col("id"), col("text"),
        graft.functions.TokenRunCount(col("text")).as("native"),
        expr("regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]')")
          .cast("long").as("rx"))
      .collect()
    assert(r.length == texts.length)
    r.foreach { x =>
      assert(x.getLong(2) == x.getLong(3),
        s"text ${x.getString(1).getBytes("UTF-8").mkString("[", ",", "]")}:" +
          s" native ${x.getLong(2)} != regex ${x.getLong(3)}")
    }
  }

  test("word_run_count == size(split-and-filter tokens) over " +
      "generated UTF-8") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val texts = sample(textGen, 150)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val r = d.select(col("id"), col("text"),
        graft.functions.WordRunCount(col("text")).as("native"),
        size(Dedup.tokens(col("text"))).cast("long").as("arr"))
      .collect()
    r.foreach { x =>
      assert(x.getLong(2) == x.getLong(3),
        s"text ${x.getString(1).getBytes("UTF-8").mkString("[", ",", "]")}:" +
          s" native ${x.getLong(2)} != array ${x.getLong(3)}")
    }
  }

  test("min_k_hex_hashes == sorted-distinct-md5 SQL spelling for " +
      "k in 1..6 over generated token arrays") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val tokenLists = sample(tokensGen, 120)
    assert(tokenLists.count(_.length >= 3) > 60) // real shingle cases
    val d = tokenLists.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "w")
    for (k <- 1 to 6) {
      val r = d.select(col("doc_id"),
          graft.functions.MinKHexHashes(col("w"), k).as("native"),
          when(size(col("w")) >= 3, expr(
            "array_join(slice(array_sort(array_distinct(" +
              "transform(sequence(1, size(w) - 2), " +
              "i -> md5(CAST(concat_ws(' ', slice(w, i, 3)) AS BINARY))" +
              s"))), 1, $k), '')")).as("sql"))
        .collect()
      r.foreach { x =>
        assert(x.isNullAt(1) == x.isNullAt(2),
          s"k=$k doc ${x.getLong(0)}: null mismatch")
        if (!x.isNullAt(1))
          assert(x.getString(1) == x.getString(2),
            s"k=$k doc ${x.getLong(0)}: ${x.getString(1)} != ${x.getString(2)}")
      }
    }
  }

  test("min_k_hex_hashes / winnow_prints: non-positive structural " +
      "parameter fails at ANALYSIS time, not executor-side") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val d = Seq((1L, Seq("a", "b", "c", "d"))).toDF("doc_id", "w")
    // k=0 would index keep(-1), w=0 would read packed(p) out of bounds
    // executor-side; the contract is a type-check rejection instead —
    // df.select analyzes eagerly, so the intercept needs no action.
    for (bad <- Seq(0, -3)) {
      val ek = intercept[org.apache.spark.sql.AnalysisException] {
        d.select(graft.functions.MinKHexHashes(col("w"), bad))
      }
      assert(ek.getMessage.contains("positive int literal"), ek.getMessage)
      val ew = intercept[org.apache.spark.sql.AnalysisException] {
        d.select(graft.functions.WinnowPrints(col("w"), bad))
      }
      assert(ew.getMessage.contains("positive int literal"), ew.getMessage)
    }
    // non-foldable parameter is equally structural: rejected too
    val ef = intercept[org.apache.spark.sql.AnalysisException] {
      d.select(expr("min_k_hex_hashes(w, CAST(doc_id AS INT))"))
    }
    assert(ef.getMessage.contains("foldable int"), ef.getMessage)
  }

  test("cdc_cuts == filter/sequence SQL spelling for (w, div) sweeps " +
      "over generated UTF-8") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val texts = sample(textGen, 120)
    assert(texts.count(_.length >= 16) > 40) // real multi-window cases
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // small div values force plenty of hash cuts at property sizes;
    // the composed spelling re-derives the cut rule from two
    // already-pinned primitives (hex_prefix_long over md5 of a
    // substring window) plus the always-cut document end.
    for ((w, dv) <- Seq((16, 32), (4, 4), (1, 2), (8, 16), (5, 3))) {
      val r = d.select(col("id"), col("text"),
          expr(s"cdc_cuts(text, $w, $dv)").as("native"),
          expr(
            s"if(length(text) = 0, array(), array_union(" +
              s"if(length(text) >= $w, filter(sequence($w, length(text)), " +
              s"p -> hex_prefix_long(md5(cast(substring(text, p - $w + 1, " +
              s"$w) as binary)), 1) % $dv = 0), array()), " +
              "array(length(text))))").as("sql"))
        .collect()
      r.foreach { x =>
        assert(x.getSeq[Int](2) == x.getSeq[Int](3),
          s"w=$w div=$dv text " +
            s"${x.getString(1).getBytes("UTF-8").mkString("[", ",", "]")}:" +
            s" native ${x.getSeq[Int](2)} != sql ${x.getSeq[Int](3)}")
      }
    }
  }

  test("cdc_cuts: non-positive structural parameters fail at " +
      "ANALYSIS time") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val d = Seq((1L, "some text")).toDF("id", "text")
    for ((w, dv) <- Seq((0, 32), (16, 0), (-1, -1))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        d.select(expr(s"cdc_cuts(text, $w, $dv)"))
      }
      assert(e.getMessage.contains("positive int literals"), e.getMessage)
    }
    val ef = intercept[org.apache.spark.sql.AnalysisException] {
      d.select(expr("cdc_cuts(text, CAST(id AS INT), 32)"))
    }
    assert(ef.getMessage.contains("foldable int"), ef.getMessage)
  }

  test("winnow_prints == hex_prefix_long/array-HOF SQL spelling for " +
      "w in 1..8 over generated token arrays") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val tokenLists = sample(tokensGen, 100)
    val d = tokenLists.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "w")
    for (win <- 1 to 8) {
      val r = d.select(col("doc_id"),
          graft.functions.WinnowPrints(col("w"), win).as("native"),
          when(size(col("w")) >= 3, expr(
            s"array_distinct(transform(" +
              s"sequence(1, greatest(size(w) - 1 - $win, 1)), " +
              "s -> array_min(slice(transform(sequence(1, size(w) - 2), " +
              "i -> hex_prefix_long(md5(CAST(concat_ws(' ', slice(w, i, 3)) " +
              s"AS BINARY)), 1) * ${1L << 20} + CAST(i - 1 AS BIGINT)), " +
              s"s, $win))))"))
            .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")).as("sql"))
        .collect()
      r.foreach { x =>
        assert(x.getSeq[Long](1) == x.getSeq[Long](2),
          s"w=$win doc ${x.getLong(0)}: " +
            s"${x.getSeq[Long](1)} != ${x.getSeq[Long](2)}")
      }
    }
  }

  // --- ks_distance_ppm (the q198 wide-counter finisher) -----------------

  /** Brute-force BigInt reference: evaluate |cum_a·n_b − cum_b·n_a| at
    * every value in the union of the two supports.
    */
  private def ksRef(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long = {
    val na = BigInt(a.map(_._2).sum)
    val nb = BigInt(b.map(_._2).sum)
    if (na == 0 || nb == 0) return 0L
    val am = a.toMap
    val bm = b.toMap
    val vs = (a.map(_._1) ++ b.map(_._1)).distinct.sorted
    var cuma = BigInt(0)
    var cumb = BigInt(0)
    var best = BigInt(0)
    for (v <- vs) {
      cuma += BigInt(am.getOrElse(v, 0L))
      cumb += BigInt(bm.getOrElse(v, 0L))
      val d = (cuma * nb - cumb * na).abs
      if (d > best) best = d
    }
    (best * 1000000 / (na * nb)).toLong
  }

  private def arrayData(h: Seq[(Long, Long)])
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      h.sortBy(_._1).map { case (v, c) =>
        org.apache.spark.sql.catalyst.InternalRow(v, c)
      }.toArray[Any])

  test("ks_distance_ppm == brute-force BigInt CDF sweep over generated " +
    "histograms (overlapping supports force tie advancement)") {
    val histGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(0, 12)
      vs <- Gen.listOfN(n, Gen.choose(-5L, 8L))
      cs <- Gen.listOfN(n, Gen.choose(1L, 20L))
    } yield vs.distinct.sorted.zip(cs)
    val cases = sample(histGen, 120, seed = 431L).grouped(2)
      .collect { case Seq(a, b) => (a, b) }.toSeq
    assert(cases.size >= 50)
    for ((a, b) <- cases) {
      val got = KsDistancePpm.ppm(arrayData(a), arrayData(b))
      assert(got == ksRef(a, b), s"a=$a b=$b")
    }
  }

  test("ks_distance_ppm: BigInt fallback past the int64 product bound " +
    "agrees with the long path's answer structure") {
    // counts ~3.2e9 per type: na*nb ≈ 4e19 > Long.MaxValue, so the
    // merge MUST take the BigInt branch; the distribution is scaled
    // from a small exemplar so the expected ppm is the exemplar's
    val small = Seq(0L -> 1L, 2L -> 3L, 5L -> 4L)
    val smallB = Seq(1L -> 2L, 2L -> 2L, 7L -> 4L)
    val k = 800000000L // scale factor: counts up to 3.2e9
    val big = small.map { case (v, c) => (v, c * k) }
    val bigB = smallB.map { case (v, c) => (v, c * k) }
    val expect = ksRef(small, smallB) // KS is scale-invariant in counts
    assert(KsDistancePpm.ppm(arrayData(big), arrayData(bigB)) == expect)
    assert(KsDistancePpm.ppm(arrayData(small), arrayData(smallB)) == expect)
  }

  test("ks_distance_ppm tolerates null elements and null struct fields " +
    "(general SQL callers; r15 ADVICE) — nulls drop, values match the " +
    "null-free reference") {
    val a = Seq(0L -> 2L, 3L -> 5L)
    val b = Seq(1L -> 1L, 4L -> 6L)
    def withJunk(h: Seq[(Long, Long)])
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val rows: Seq[Any] = h.sortBy(_._1).flatMap { case (v, c) =>
        Seq[Any](null, // null element
          org.apache.spark.sql.catalyst.InternalRow(null, 7L), // null v
          org.apache.spark.sql.catalyst.InternalRow(v, c),
          org.apache.spark.sql.catalyst.InternalRow(v + 1000L, null)) // null c
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
    }
    assert(KsDistancePpm.ppm(withJunk(a), withJunk(b)) == ksRef(a, b))
    // all-null histogram folds to empty → 0, not an NPE
    val allNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](null, org.apache.spark.sql.catalyst.InternalRow(null, null)))
    assert(KsDistancePpm.ppm(allNull, arrayData(a)) == 0L)
    // a REAL Long.MaxValue value ties the exhausted side's sentinel —
    // must not index past the end (merge bounds guard)
    val maxed = Seq(Long.MaxValue -> 3L)
    assert(KsDistancePpm.ppm(arrayData(maxed), arrayData(maxed)) == 0L)
    assert(KsDistancePpm.ppm(arrayData(maxed), arrayData(a)) ==
      ksRef(maxed, a))
  }

  test("ks_distance_ppm via SQL over a frame matches the reference " +
    "(registration + column plumbing)") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.install(s)
    val df = Seq(
      ("a", 1L, 2L), ("a", 3L, 5L), ("b", 1L, 1L), ("b", 4L, 6L))
      .toDF("t", "v", "c")
      .groupBy(col("t"))
      .agg(sort_array(collect_list(struct(col("v"), col("c")))).as("h"))
    val r = df.as("x").join(df.as("y"), col("x.t") < col("y.t"))
      .select(KsDistancePpm(col("x.h"), col("y.h")).as("ppm"))
      .collect()
    assert(r.map(_.getLong(0)).toSeq ==
      Seq(ksRef(Seq(1L -> 2L, 3L -> 5L), Seq(1L -> 1L, 4L -> 6L))))
  }
}
