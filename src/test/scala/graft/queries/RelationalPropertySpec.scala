package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkEntry
import graft.engine.SparkSpec

/** Brute-force semantic pins for the round-13 TPC-H-shaped gates
  * (q185–q190). The oracle gate proves Spark == DuckDB on the driver's
  * testdata; these pins prove the REFORMULATIONS are the intended
  * semantics on arbitrary inputs — in particular q189, where the
  * reference shape (a correlated EXISTS + NOT-EXISTS pair over a
  * lineitem self-join) is re-expressed as one per-order aggregate, and
  * q187's band edges, where an off-by-one in the CASE chain would
  * survive any single dataset that lacks boundary latencies.
  *
  * Each test materializes tiny synthetic parquet tables in a temp dir
  * (multi-file, so the gate's scan shape matches real layouts) and runs
  * the REGISTERED gate lambda — not a copy of its logic.
  */
class RelationalPropertySpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  /** Deterministic pseudo-random samples (fixed seeds — the repo-wide
    * reproducibility rule for property tests).
    */
  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(20), Seed(seed + i)))

  /** Post-1970 epoch day → timestamp (UTC session; micros parquet). */
  private def ts(day: Long): Timestamp = new Timestamp(day * 86400000L)

  private def writeDir(tables: (String, DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft-relprop").toString
    tables.foreach { case (n, df) =>
      df.repartition(3).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  private def cents(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  // one order: (status, orderDay, lines as (suppkey, shipLatencyDays))
  private type OrderGen = (String, Long, List[(Long, Long)])

  private val orderGen: Gen[OrderGen] = for {
    st <- Gen.oneOf("F", "O", "P")
    oday <- Gen.choose(100L, 300L)
    lines <- Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 120L)))
  } yield (st, oday, lines)

  test("q189: the per-order aggregate collapse equals the explicit " +
    "EXISTS + NOT-EXISTS (sole-late-supplier) semantics") {
    val gen = Gen.nonEmptyListOf(orderGen)
    for ((orders, si) <- samples(gen, 6, 189189L).zipWithIndex) {
      val ord = orders.zipWithIndex.map { case ((st, oday, _), i) =>
        (i.toLong, st, ts(oday))
      }.toDF("o_orderkey", "o_orderstatus", "o_orderdate")
      val li = orders.zipWithIndex.flatMap { case ((_, oday, lines), i) =>
        lines.map { case (sk, lat) => (i.toLong, sk, ts(oday + lat)) }
      }.toDF("l_orderkey", "l_suppkey", "l_shipdate")
      val sup = (0L to 4L).map(k => (k, s"Supplier#$k"))
        .toDF("s_suppkey", "s_name")
      val dir = writeDir("orders" -> ord, "lineitem" -> li,
        "supplier" -> sup)

      // brute force, straight from the reference Q21 shape: supplier S
      // waits on order O iff O is finalized, S shipped late on O, O has
      // >= 2 distinct suppliers, and NO OTHER supplier shipped late on O.
      val waits = for {
        ((st, _, lines), _) <- orders.zipWithIndex
        if st == "F"
        supps = lines.map(_._1).toSet
        late = lines.filter(_._2 > 60).map(_._1).toSet
        if supps.size >= 2 && late.size == 1
      } yield late.head
      val expected = waits.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .map { case (k, n) => (s"Supplier#$k", n) }
        .sortBy { case (name, n) => (-n, name) }
        .take(10)

      val got = SparkEntry.queries("q189_waiting_supplier_ranking")(s, dir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected, s"seed $si: $got vs $expected on $orders")
    }
  }

  test("q187: latency bands split exactly at 30/60 days (boundary " +
    "latencies land on the documented side)") {
    // fixed boundary latencies × both priority classes, plus random fill
    val boundary = Seq(0L, 29L, 30L, 31L, 59L, 60L, 61L, 120L)
    val gen = Gen.listOf(Gen.zip(Gen.choose(0L, 120L),
      Gen.oneOf("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW")))
    for ((extra, si) <- samples(gen, 6, 187187L).zipWithIndex) {
      val all = boundary.map((_, "1-URGENT")) ++
        boundary.map((_, "4-NOT SPECIFIED")) ++ extra
      val ord = all.zipWithIndex.map { case ((_, prio), i) =>
        (i.toLong, prio, ts(200L))
      }.toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      val li = all.zipWithIndex.map { case ((lat, _), i) =>
        (i.toLong, ts(200L + lat))
      }.toDF("l_orderkey", "l_shipdate")
      val dir = writeDir("orders" -> ord, "lineitem" -> li)

      def band(lat: Long): String =
        if (lat <= 30) "0-30" else if (lat <= 60) "31-60" else "61+"
      val hiSet = Set("1-URGENT", "2-HIGH")
      val expected = all.groupBy { case (lat, _) => band(lat) }.view
        .mapValues { ls =>
          (ls.count(l => hiSet(l._2)).toLong,
            ls.count(l => !hiSet(l._2)).toLong)
        }.toSeq.sortBy(_._1)
        .map { case (b, (h, l)) => (b, h, l) }

      val got = SparkEntry.queries("q187_latency_priority_matrix")(s, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == expected, s"seed $si: $got vs $expected")
    }
  }

  test("q185: exact scale-10^4 profit equals BigInt cents arithmetic " +
    "on random 2-dp money") {
    val money = Gen.choose(1L, 9999999L).map(_ / 100.0)  // 2-dp doubles
    val lineGen = Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 2L),
      money, Gen.choose(0L, 10L).map(_ / 100.0), Gen.choose(1L, 50L))
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(100L, 3000L), lineGen))
    for ((rows, si) <- samples(gen, 6, 185185L).zipWithIndex) {
      val parts = (0L to 3L).map(p => (p, 100.0 + 7 * p))
      val ord = rows.zipWithIndex.map { case ((oday, _), i) =>
        (i.toLong, ts(oday))
      }.toDF("o_orderkey", "o_orderdate")
      val li = rows.zipWithIndex.map { case ((_, (pk, sk, ext, d, q)), i) =>
        (i.toLong, pk, sk, ext, d, q.toDouble)
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount", "l_quantity")
      val sup = (0L to 2L).map(k => (k, k % 2)).toDF("s_suppkey",
        "s_nationkey")
      val nat = (0L to 1L).map(k => (k, s"NATION_$k"))
        .toDF("n_nationkey", "n_name")
      val prt = parts.toDF("p_partkey", "p_retailprice")
      val dir = writeDir("orders" -> ord, "lineitem" -> li,
        "supplier" -> sup, "nation" -> nat, "part" -> prt)

      val expected = rows.zipWithIndex.map {
        case ((oday, (pk, sk, ext, d, q)), _) =>
          val nation = s"NATION_${sk % 2}"
          // UTC calendar year of the epoch day (proleptic, matches both
          // engines' EXTRACT(year) under the pinned UTC session)
          val year = java.time.LocalDate.ofEpochDay(oday).getYear.toLong
          val amount4 = BigInt(cents(ext)) * (100 - cents(d)) -
            BigInt(cents(100.0 + 7 * pk)) * q * 100
          ((nation, year), amount4)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .map { case ((n, y), a4) => (n, y, a4.toDouble / 10000) }
        .sortBy { case (n, y, _) => (n, y) }

      val got = SparkEntry.queries("q185_profit_census")(s, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      assert(got == expected, s"seed $si: $got vs $expected")
    }
  }

  test("q190: threshold + sole-anti-leg semantics equal brute force on " +
    "random balances and priorities") {
    val balGen = Gen.choose(-99900L, 999900L).map(_ / 100.0)
    val custGen = Gen.zip(balGen, Gen.oneOf("SEG_A", "SEG_B", "SEG_C"),
      Gen.listOf(Gen.oneOf("1-URGENT", "3-MEDIUM", "5-LOW")))
    val gen = Gen.nonEmptyListOf(custGen)
    for ((custs, si) <- samples(gen, 6, 190190L).zipWithIndex) {
      val cust = custs.zipWithIndex.map { case ((bal, seg, _), i) =>
        (i.toLong, bal, seg)
      }.toDF("c_custkey", "c_acctbal", "c_mktsegment")
      val ord = custs.zipWithIndex.flatMap { case ((_, _, prios), i) =>
        prios.zipWithIndex.map { case (p, j) =>
          (i * 1000L + j, i.toLong, p)
        }
      }.toDF("o_orderkey", "o_custkey", "o_orderpriority")
      val dir = writeDir("customer" -> cust, "orders" -> ord)

      val pos = custs.map(_._1).filter(_ > 0)
      // replicate the float op order exactly: int sum → /100 → /count
      val thr = BigInt(pos.map(cents).sum).toDouble / 100 / pos.size
      val expected = custs
        .filter { case (bal, _, prios) =>
          bal > thr && !prios.contains("1-URGENT")
        }
        .groupBy(_._2).view
        .mapValues { cs =>
          (cs.size.toLong,
            BigInt(cs.map(c => cents(c._1)).sum).toDouble / 100)
        }.toSeq.map { case (seg, (n, tot)) => (seg, n, tot) }
        .sortBy(_._1)

      val got = SparkEntry.queries("q190_idle_rich_customers")(s, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      assert(got == expected, s"seed $si: $got vs $expected on $custs")
    }
  }
}
