package graft

import org.apache.spark.sql.functions._

/** DEV-SIDE paired A/B for the hex-prefix fold: the generated
  * `instr/substr` SQL chain vs the native `HexPrefixLong` expression,
  * interleaved in one session over one persisted md5 frame so
  * co-tenant load hits both sides equally. Prints per-round times and
  * the two checksums (must be equal — the value contract).
  *
  * Usage: runMain graft.ProfileHex [sfDir] [rounds]
  */
object ProfileHex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.install(spark)

    val h = graft.operators.Dedup
      .shingles(Tables(spark, sfDir, "documents"))
      .select(md5(col("shingle").cast("binary")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = h.count() // materialize before timing
    println(s"[hex] rows=$n")
    require(n > 0, s"no shingles under $sfDir — wrong path?")

    def time(tag: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val s = h.agg(sum(c)).collect()(0).getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[hex] $tag%-7s $dt%7.3f s  checksum=$s")
    }
    for (_ <- 1 to rounds) {
      time("chain",
        expr(graft.operators.Dedup.hexToLongSql("h", 1, "instr")) +
          expr(graft.operators.Dedup.hexToLongSql("h", 9, "instr")))
      time("native",
        graft.operators.Dedup.hexPrefix(col("h"), 1) +
          graft.operators.Dedup.hexPrefix(col("h"), 9))
    }
    spark.stop()
  }
}
