package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DEV-SIDE round-15 measurement harness (VERDICT r14 round-15 list):
  *
  *  - `q198`: stage + full walls for the wide-counter KS respelling
  *    (ask #2) — S2 is the (type, cents) collapse, the measured floor
  *    the finisher used to sit ~1.8–2.3 s above at 400×.
  *  - `q179`: stage + full walls for the 800× octave extension
  *    (ask #5) — S2 is the quantized (label, dim) collapse the r14
  *    decomposition showed ≈ full.
  *  - `pkproj`: the partkey-clustered lineitem projection A/B for q03
  *    (ask #6): write the projection (one-time cost, timed), run q03
  *    through its deployed resolution (projection present → used),
  *    drop it, run q03 plain — same JVM, same window.
  *
  * The 400× deployed fact-pair leg (ask #1) stays in ProfileR13
  * `facts`. Official protocol: 8 GB heap (16 GB for 400× order-grain),
  * warm best-of-N, blocking cache release between iterations, paired
  * same-window tools/bench_duckdb.py oracle leg, loadavg recorded.
  *
  * Usage: runMain graft.ProfileR15 [sfDir] [iters] [op]
  *   op ∈ q198 | q179 | pkproj | all(default: q198+q179)
  */
object ProfileR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf200")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val op = args.lift(2).getOrElse("all")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheRegistry.release(blocking = true)
        t
      }
      println(f"[$name%-18s] " + times.map(t => f"$t%8.3f").mkString(" "))
    }

    if (op == "q198" || op == "all") {
      import graft.queries.Q
      val events = Tables.events(spark, sfDir)
      time("q198 S2 collapse") {
        events.select(col("event_type").as("t"),
            Q.cents(col("value")).as("v"))
          .groupBy(col("t"), col("v"))
          .agg(count(lit(1)).as("c"))
      }
      time("q198 full")(
        graft.operators.EventFunnel.ksValueDrift(events))
    }

    if (op == "q179" || op == "all") {
      val embs = Tables(spark, sfDir, "embeddings")
      time("q179 S2 collapse") {
        embs.select(col("label"),
            posexplode(expr("transform(embedding, x -> " +
              "CAST(floor(CAST(x AS double) * 1000000 + 0.5) AS bigint))"))
              .as(Seq("dim", "q")))
          .groupBy(col("label"), col("dim"))
          .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      }
      time("q179 full")(
        graft.operators.Similarity.centroidShift(embs))
    }

    if (op == "factsreuse") {
      // Re-attach the fact-pair layout written by a PREVIOUS JVM's
      // ProfileR13 `facts` run: the session catalog is in-memory, so
      // the managed tables vanish with the writer JVM even though the
      // warehouse dirs persist. External bucketed DDL over the same
      // files + re-tagged source fingerprint restores the
      // bucketedSource resolution without paying the 400+ s write —
      // letting the gate leg run in a CLEAN load window instead of the
      // write's page-cache/loadavg wake (the first 400× sample's q163
      // confound), and demonstrating the layout is re-attachable
      // across sessions (a warehouse doesn't rewrite per session).
      import graft.operators.CorpusWriter
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      // value-identity guard BEFORE re-attaching: a mis-declared
      // external bucket spec would make bucket-local joins silently
      // drop matches, so the plain-files answer (tables not yet in
      // this fresh JVM's catalog) is the reference the re-attached
      // leg must reproduce exactly
      val plainRef = SparkEntry.queries("q163_market_share")(spark, sfDir)
        .collect().map(_.toString).sorted.mkString("\n").hashCode
      def reattach(table: String, bucketCol: String,
          sourceFile: String): Unit = {
        val loc = s"$wh/$table"
        // provenance guard: the warehouse keeps whatever the LAST
        // writer left (e.g. a 200× Bench leg), and re-tagging blindly
        // would claim it came from THIS sfDir — q163's join shape even
        // masks the mismatch (the smaller dims filter the bigger fact
        // back to the smaller answer) while the timings silently
        // measure the wrong corpus. Row-count equality with the
        // claimed source is cheap (parquet metadata count) and
        // catches every cross-scale mix-up.
        val whCount = spark.read.parquet(loc).count()
        val srcCount = spark.read.parquet(s"$sfDir/$sourceFile").count()
        require(whCount == srcCount,
          s"$table holds $whCount rows but $sfDir/$sourceFile has " +
            s"$srcCount — the warehouse layout was written from a " +
            "different corpus; rerun ProfileR13 facts for this dir")
        val schema = spark.read.parquet(loc).schema.toDDL
        // If the table already exists MANAGED in this JVM (a facts
        // write earlier in the same session), DROP would DELETE the
        // warehouse data files — destroying the 400+ s layout this
        // mode exists to reuse, with the value-identity require only
        // firing after the data is gone (r15 ADVICE). A managed table
        // is already attached: skip the re-attach entirely.
        val existing = try Some(spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
        catch { case _: Exception => None }
        if (existing.exists(_.tableType ==
            org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)) {
          println(s"[factsreuse] $table already MANAGED in this " +
            "session — skipping re-attach (dropping would delete the " +
            "warehouse files)")
          return
        }
        spark.sql(s"DROP TABLE IF EXISTS $table")
        spark.sql(s"CREATE TABLE $table ($schema) USING PARQUET " +
          s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
          s"INTO 128 BUCKETS LOCATION 'file:$loc'")
        spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
          s"('${CorpusWriter.EventsSourceProp}' = '$sfDir', " +
          s"'${CorpusWriter.EventsFingerprintProp}' = " +
          s"'${CorpusWriter.sourceFingerprint(spark, sfDir, sourceFile)}')")
      }
      reattach(CorpusWriter.DefaultLineitemTable, "l_orderkey",
        "lineitem.parquet")
      reattach(CorpusWriter.DefaultOrdersTable, "o_orderkey",
        "orders.parquet")
      // prove the substitution resolved AND the bucketed scan elides
      // the orderkey exchange before timing anything
      val probe = SparkEntry.queries("q163_market_share")(spark, sfDir)
      val nEx = probe.queryExecution.executedPlan.toString
        .split('\n').count(_.contains("Exchange hashpartitioning(l_orderkey"))
      val reHash = probe.collect().map(_.toString).sorted
        .mkString("\n").hashCode
      require(reHash == plainRef,
        "re-attached bucketed layout changed q163's answer — bucket " +
          "spec mismatch; timings would be meaningless")
      println(s"[factsreuse probe  ] l_orderkey exchanges in q163 plan: " +
        s"$nEx; value identity vs plain files: OK")
      for (n <- Seq("q163_market_share", "q02_pricing_summary",
          "q176_returned_customers"))
        time(n)(SparkEntry.queries(n)(spark, sfDir))
      // q11 A/B (r15 watch item): the custkey window over orders reads
      // the ORDERKEY-bucketed table on the deployed leg — a layout that
      // serves orderkey joins, not this window. Same JVM, same window:
      // substituted vs plain-files orders.
      time("q11 bucketed-orders")(
        SparkEntry.queries("q11_window_rank")(spark, sfDir))
      val plainOrders = spark.read.parquet(s"$sfDir/orders.parquet")
      time("q11 plain-orders") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        plainOrders
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rn"))
          .where(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      }
    }

    if (op == "pkproj") {
      import graft.operators.CorpusWriter
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultLineitemByPartTable)
      val t0 = System.nanoTime()
      CorpusWriter.writePartProjection(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        sourceDir = Some(sfDir))
      println(f"[pkproj write      ] ${(System.nanoTime() - t0) / 1e9}%8.3f")
      time("q03 projection")(
        SparkEntry.queries("q03_join_broadcast_dim")(spark, sfDir))
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultLineitemByPartTable)
      time("q03 plain")(
        SparkEntry.queries("q03_join_broadcast_dim")(spark, sfDir))
    }
    spark.stop()
  }
}
