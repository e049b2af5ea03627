package graft

/** Dev harness: interleaved A/B for the [[graft.plans.NativeSubstitutionRule]]
  * optimizer substitutions, timing the USER-written SQL spellings with the
  * rule disabled vs enabled on the same session and data.
  *
  * Two legs, each a full-corpus aggregate over `documents.text`:
  *  - word: SUM(size(filter(split(lower(text),' '), t -> t <> ''))) per source
  *  - token: SUM(size(regexp_extract_all(lower(text), BPE, 0))) per source
  *    (each leg pins its flag explicitly, so the harness is
  *    independent of the rule's defaults)
  *
  * Usage: sbt "runMain graft.ProfileSubst [sfDir] [iters]"
  */
object ProfileSubst {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf50")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("documents")

    val word = "SELECT source, SUM(size(filter(split(lower(text), ' '), " +
      "t -> t <> ''))) AS words FROM documents GROUP BY source"
    val token = "SELECT source, SUM(size(regexp_extract_all(lower(text), " +
      "'[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))) AS toks FROM documents GROUP BY source"

    def time(sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val hex = "SELECT source, SUM(" + graft.operators.Dedup
      .hexToLongSql("md5(text)", 1, "instr") +
      ") AS s FROM documents GROUP BY source"

    for ((leg, sql, flag) <- Seq(
        ("word", word, "spark.graft.substitute.wordRunCount"),
        ("token", token, "spark.graft.substitute.tokenRunCount"),
        ("hex", hex, "spark.graft.substitute.hexPrefix"))) {
      // interleaved off/on pairs so drift hits both sides equally
      val pairs = (1 to iters).map { _ =>
        spark.conf.set(flag, "false")
        val off = time(sql)
        spark.conf.set(flag, "true")
        val on = time(sql)
        spark.conf.unset(flag)
        (off, on)
      }
      val fmt = pairs.map { case (o, n) => f"$o%6.2f/$n%5.2f" }.mkString(" ")
      println(f"[subst] $leg%-5s off/on pairs (s): $fmt")
    }
    spark.stop()
  }
}
