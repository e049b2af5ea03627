package graft

import org.apache.spark.sql.{DataFrame, SaveMode}

/** DEV-SIDE scale rehearsal: proves the doc_id-keyed join family
  * (q102 corpus diff, q103 index coverage, q111 incremental match —
  * every "join documents to a doc-keyed side" shape) goes
  * SHUFFLE-FREE when both sides are written bucketed by the join key,
  * which is exactly how a 100 TB lakehouse lays these tables out.
  *
  * What it does:
  *  1. writes `documents` and a derived embeddings-id table from the
  *     given SF dir as bucketed tables (`bucketBy(N, doc_id)`, sorted);
  *  2. runs the q103-shape left join plain-parquet vs bucketed, prints
  *     the Exchange count in each physical plan and steady wall times.
  *
  * Expected: plain = 2 Exchanges (one per side) feeding a SortMergeJoin
  * or SHJ; bucketed = 0 Exchanges (bucket-local join). The absolute
  * win at this toy scale is bounded by the shuffle being small; the
  * structural point is the Exchange disappearing — at 100 TB that
  * Exchange IS the cost (a full re-shuffle of the fact table per
  * query, vs none amortized across every doc-keyed join forever).
  *
  * Usage: runMain graft.BucketRehearsal [sfDir] [buckets] [iters]
  */
object BucketRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val iters = args.lift(2).map(_.toInt).getOrElse(4)
    // optional 4th arg: regex over {docs, pair, sess, ops} — the pair
    // leg is Σ|block|² and only runs at sf0.1-ish scale; ops drives the
    // shipped writeEvents layout through funnel/sessionFeatures/
    // interArrival
    val legs = args.lift(3).getOrElse("docs|pair|sess|ops").r
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // model the 100 TB regime: neither side of a fact-fact doc_id join
    // broadcasts (at toy scale the planner would broadcast the 250k-row
    // side and hide exactly the Exchange this rehearsal measures)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")

    def audit(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      if (sys.env.contains("BUCKET_DUMP_PLANS")) println(s"=== $name\n$plan")
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bucket] $name%-10s exchanges=$exchanges " +
        times.map(t => f"$t%6.3f").mkString(" "))
    }

    if (legs.findFirstIn("docs").isDefined) {
      val docs = Tables(spark, sfDir, "documents")
        .select("doc_id", "source", "n_chars")
      val vecs = Tables(spark, sfDir, "embeddings")
        .selectExpr("vec_id AS doc_id", "label")
      dropBucketTable(spark, wh, "docs_b")
      dropBucketTable(spark, wh, "vecs_b")
      docs.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "doc_id").sortBy("doc_id").saveAsTable("docs_b")
      vecs.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "doc_id").sortBy("doc_id").saveAsTable("vecs_b")

      // the q103 shape: fact-side left join + per-source agg
      def shape(d: DataFrame, v: DataFrame): DataFrame =
        d.join(v, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(org.apache.spark.sql.functions.count("label").as("n_indexed"))

      audit("plain", shape(docs, vecs))
      audit("bucketed", shape(spark.table("docs_b"), spark.table("vecs_b")))
    }

    // Second rehearsal: the CLUSTER-keyed family. semanticDedup /
    // knnGraph / semanticDecontamination self-join the inverted file
    // on cluster id; their scaladocs claim "at real scale the
    // assignment table is written bucketed by cluster id and the
    // self-join shuffles on it". Materialize that claim: write
    // (k, vec_id, embedding) bucketed by k and re-plan the q122
    // candidate-pair shape — the join-side Exchanges must vanish.
    if (legs.findFirstIn("pair").isDefined) {
      graft.functions.GraftFunctions.install(spark)
      val emb = Tables(spark, sfDir, "embeddings")
      val inverted = {
        // deterministic stand-in for the trained assignment (the
        // rehearsal is about layout, not the quantizer): label is
        // already a cluster-shaped key at this SF
        emb.selectExpr("label AS k", "vec_id", "embedding")
      }
      dropBucketTable(spark, wh, "inv_b")
      inverted.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "k").sortBy("k", "vec_id").saveAsTable("inv_b")

      def pairShape(inv: DataFrame): DataFrame = {
        val a = inv.selectExpr("k", "vec_id AS va", "embedding AS ea")
        val b = inv.selectExpr("k", "vec_id AS vb", "embedding AS eb")
        a.join(b, Seq("k"))
          .where($"va" < $"vb")
          .select($"k",
            graft.operators.Similarity.cosine($"ea", $"eb").as("c"))
          .groupBy("k")
          .agg(org.apache.spark.sql.functions
            .sum(org.apache.spark.sql.functions
              .when($"c" >= 0.25, 1L).otherwise(0L)).as("n_close"))
      }
      audit("pair-plain", pairShape(inverted))
      audit("pair-bucketed", pairShape(spark.table("inv_b")))
    }

    // Third rehearsal: the USER-keyed event family. ProfileQ22Decomp
    // proved q22's cost IS the user_id shuffle (it alone exceeds the
    // oracle's whole query at 50×); sessionization, inter-arrival
    // (q110), session features (q75), and funnels all re-shuffle
    // events by user_id per query. A lakehouse ingesting events at
    // 100 TB writes them bucketed by user_id ONCE; every per-user
    // analytic then plans with zero Exchange. Materialize that claim.
    if (legs.findFirstIn("sess").isDefined) {
    val ev = Tables(spark, sfDir, "events")
    val events = ev.select($"user_id", Tables.epochSec(ev).as("sec"))
    dropBucketTable(spark, wh, "events_b")
    events.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "user_id").sortBy("user_id", "sec")
      .saveAsTable("events_b")

    audit("sess-plain", sessionizeShape(events))
    audit("sess-bucketed", sessionizeShape(spark.table("events_b")))
    }

    // Fourth rehearsal: the SHIPPED writeEvents layout feeding the full
    // per-user operator family (funnel q63, session features q75,
    // inter-arrival q110) — the schema-preserving writer the resolver
    // (Tables.events) substitutes in production. Same structural
    // expectation: the corpus-sized user_id Exchange vanishes; what
    // remains is presentation sorts and count-table-sized aggs.
    if (legs.findFirstIn("ops").isDefined) {
      val ev = Tables(spark, sfDir, "events")
      dropBucketTable(spark, wh, operators.CorpusWriter.DefaultEventsTable)
      operators.CorpusWriter.writeEvents(ev, buckets = buckets,
        sourceDir = Some(sfDir))
      val b = Tables.events(spark, sfDir)
      require(b.inputFiles.forall(
        _.contains(operators.CorpusWriter.DefaultEventsTable)),
        "resolver did not substitute the bucketed layout")
      audit("fun-plain", operators.EventFunnel.funnel(ev))
      audit("fun-bucket", operators.EventFunnel.funnel(b))
      audit("sf-plain", operators.EventFunnel.sessionFeatures(ev))
      audit("sf-bucket", operators.EventFunnel.sessionFeatures(b))
      audit("ia-plain", operators.EventFunnel.interArrival(ev))
      audit("ia-bucket", operators.EventFunnel.interArrival(b))
    }
    spark.stop()
  }

  /** The q22 shape (array-sort sessionize over (user_id, sec), minus
    * the presentation ORDER BY — the rehearsal measures the
    * aggregation shuffle). Public so DataPipelineSpec pins the
    * zero-Exchange plan on a bucketed events table.
    */
  def sessionizeShape(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    ev.groupBy("user_id")
      .agg(count(col("sec")).as("n_events"),
        array_sort(collect_list(col("sec"))).as("secs"))
      .select(col("user_id"),
        (lit(1L) + size(filter(
          zip_with(
            expr("slice(secs, 1, size(secs) - 1)"),
            expr("slice(secs, 2, size(secs) - 1)"),
            (a, b) => b - a > 1800),
          x => x)).cast("long")).as("n_sessions"),
        col("n_events"))
  }

  /** Drop a bucketed table AND its warehouse dir (DROP on a fresh
    * session's catalog does not remove a previous run's orphaned dirs —
    * saveAsTable would fail with LOCATION_ALREADY_EXISTS). The walk
    * stream is closed (it holds directory handles open otherwise).
    */
  def dropBucketTable(spark: org.apache.spark.sql.SparkSession,
      wh: String, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val p = java.nio.file.Paths.get(wh, name)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(p)
      try st.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
      finally st.close()
    }
  }
}
