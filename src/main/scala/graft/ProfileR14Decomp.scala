package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DEV-SIDE round-14 stage decomposition for the flat-wall census
  * gates that stay >2× at the 400× replica (q162, q179, q182, q183,
  * q198): the q161/q02 closure protocol — time the bare scan (S0) and
  * the first fact-collapsing aggregate (S2) of each gate next to its
  * full plan, so the residual either has a lever (full ≫ S2: something
  * above the collapse is wrong) or is the engine-regime floor
  * (S2 ≈ full and S2 alone ≥ the oracle's whole query).
  *
  * Usage: runMain graft.ProfileR14Decomp [sfDir] [iters]
  */
object ProfileR14Decomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf400")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.install(spark)

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warm
      System.gc()
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheRegistry.release(blocking = true)
        t
      }
      println(f"[decomp] $name%-22s load=${ProfileR14.loadavg()}%-6s " +
        ts.map(t => f"$t%8.3f").mkString(" "))
    }

    val docs = Tables(spark, sfDir, "documents")
    val embs = Tables(spark, sfDir, "embeddings")
    val events = Tables.events(spark, sfDir)

    // --- q162 dup_spread_census (documents): scan → md5 16-byte-key agg
    time("q162 S0 scan") {
      docs.select(col("text"))
    }
    time("q162 S2 md5agg") {
      docs.select(unhex(md5(col("text").cast("binary"))).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("n"))
    }
    time("q162 full")(SparkEntry.queries("q162_dup_spread_census")(spark, sfDir))

    // --- q179/q182 (embeddings): scan → per-vector quantized norm → label agg
    time("q179 S0 scan") {
      embs.select(col("embedding"), col("label"))
    }
    time("q179 S2 normagg") {
      embs.select(col("label"), graft.operators.Similarity
          .dotQ(col("embedding"), col("embedding")).as("qn"))
        .groupBy(col("label")).agg(count(lit(1)).as("n"), sum(col("qn")).as("s"))
    }
    time("q179 full")(SparkEntry.queries("q179_centroid_shift")(spark, sfDir))
    time("q182 full")(SparkEntry.queries("q182_norm_bands")(spark, sfDir))

    // --- q183/q198 (events): scan → (type, cents) collapse
    time("q183 S0 scan") {
      events.select(col("event_type"), col("value"))
    }
    time("q183 S2 typecents") {
      events.select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("n"))
    }
    time("q183 full")(SparkEntry.queries("q183_value_percentiles")(spark, sfDir))
    time("q198 full")(SparkEntry.queries("q198_ks_value_drift")(spark, sfDir))

    spark.stop()
  }
}
