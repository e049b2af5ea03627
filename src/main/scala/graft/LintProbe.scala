package graft

import org.apache.spark.sql.functions._

/** Scratch probe (round 14): run the PlanLint rules (incl. the new
  * shared-subtree rule) over every gate at a given SF dir, plus the
  * seeded unpersisted-q194 spelling the lint must fire on.
  */
object LintProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    // The unpersisted q194 spelling — the seeded defect.
    {
      def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
      def cents(c: org.apache.spark.sql.Column) =
        floor(c * 100 + 0.5).cast("long")
      val rev = t("lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("rev"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("rev")).as("cents"))
      val mx = rev.agg(max(col("cents")).as("m"))
      val winners = rev.crossJoin(broadcast(mx)).where(col("cents") === col("m"))
      val out = t("supplier")
        .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"))
      val vs = PlanLint.lint(out)
      println(s"SEEDED_q194_unpersisted -> ${if (vs.isEmpty) "CLEAN (BAD!)" else vs.mkString("; ")}")
    }

    for (d <- SparkEntry.allDefs) {
      try {
        val vs = PlanLint.lint(d.spark(spark, dir))
        if (vs.nonEmpty) println(s"FIRE ${d.name} -> ${vs.mkString("; ")}")
      } catch { case e: Throwable =>
        println(s"ERR ${d.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println("done")
    spark.stop()
  }
}
