package graft

/** DEV-SIDE round-16 measurement harness: the ProfileR14 protocol
  * (warm once, timed full-plan noop writes, GC fence + BLOCKING cache
  * release per iteration, loadavg printed per row) plus the quantized-
  * embeddings-projection legs this round deploys (VERDICT r15 ask #3):
  *
  *   runMain graft.ProfileR16 <sfDir> <iters> [embquant|dropembquant] <name>...
  *
  *  - `embquant`: drop + rewrite the quantized projection
  *    (CorpusWriter.writeEmbQuantProjection) for <sfDir> first — timed
  *    and reported separately, the layout_write_sec convention — then
  *    time the gates, which resolve it via embQuantProjection;
  *  - `dropembquant`: remove the projection so the SAME JVM times the
  *    plain-float leg (the A/B control, ProfileR15's factsreuse shape).
  *
  * The DuckDB side of a paired table: tools/bench_duckdb.py <sfDir>
  * <oracle_sql.json> <names> run back-to-back in the same window.
  */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    var wanted = args.drop(2)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    import graft.operators.CorpusWriter
    if (wanted.headOption.contains("dropembquant")) {
      wanted = wanted.drop(1)
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultEmbQuantTable)
      println("[r16] dropped quantized embeddings projection")
    }
    if (wanted.headOption.contains("embquant")) {
      wanted = wanted.drop(1)
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultEmbQuantTable)
      val t0 = System.nanoTime()
      val ok = CorpusWriter.writeEmbQuantProjection(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        sourceDir = Some(sfDir))
      println(f"[r16] embquant write ok=$ok ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    if (wanted.headOption.contains("dropdocdigest")) {
      wanted = wanted.drop(1)
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultDocDigestTable)
      println("[r16] dropped documents digest projection")
    }
    if (wanted.headOption.contains("docdigest")) {
      wanted = wanted.drop(1)
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultDocDigestTable)
      val t0 = System.nanoTime()
      CorpusWriter.writeDocDigestProjection(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        sourceDir = Some(sfDir))
      println(f"[r16] docdigest write ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // `libucket`: write ONLY the orderkey-bucketed lineitem half of the
    // fact pair (for replicas that carry no orders table — the q02
    // 800× pin needs just the lineitem layout; q02 never reads orders).
    if (wanted.headOption.contains("libucket")) {
      wanted = wanted.drop(1)
      BucketRehearsal.dropBucketTable(spark, wh,
        CorpusWriter.DefaultLineitemTable)
      val t0 = System.nanoTime()
      CorpusWriter.writeBucketedSource(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        CorpusWriter.DefaultLineitemTable, "l_orderkey",
        Seq("l_orderkey"), 128, Some(sfDir), "lineitem.parquet")
      println(f"[r16] libucket write ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // `lireuse`: re-attach a lineitem bucketed layout written by a
    // PREVIOUS JVM (external bucketed DDL + fingerprint re-tag — the
    // ProfileR15 factsreuse pattern, lineitem-only) so the gate leg
    // runs in a CLEAN load window instead of the write's
    // page-cache/loadavg wake (the r15 "write-wake confound": the
    // first 800× q02 sample ran at loadavg 27–31 right after a 253 s
    // bucketed write and read 3× its clean-window wall). Same guards:
    // row-count provenance vs the claimed source, MANAGED-table skip,
    // and q02 value identity vs the plain files before timing.
    if (wanted.headOption.contains("lireuse")) {
      wanted = wanted.drop(1)
      val table = CorpusWriter.DefaultLineitemTable
      val loc = s"$wh/$table"
      // full sorted row strings, not a 32-bit hashCode (r16 ADVICE:
      // a collision would pass a changed answer through a correctness
      // require) — q02's output is 6 rows, the compare is free
      val plainRef = SparkEntry.queries("q02_pricing_summary")(spark, sfDir)
        .collect().map(_.toString).sorted.mkString("\n")
      val existing = try Some(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
      catch { case _: Exception => None }
      if (existing.exists(_.tableType ==
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)) {
        println(s"[r16] $table already MANAGED — skipping re-attach")
      } else {
        val whCount = spark.read.parquet(loc).count()
        val srcCount = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
        require(whCount == srcCount,
          s"$table holds $whCount rows but $sfDir has $srcCount — " +
            "layout written from a different corpus")
        val schema = spark.read.parquet(loc).schema.toDDL
        spark.sql(s"DROP TABLE IF EXISTS $table")
        spark.sql(s"CREATE TABLE $table ($schema) USING PARQUET " +
          "CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) " +
          s"INTO 128 BUCKETS LOCATION 'file:$loc'")
        spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
          s"('${CorpusWriter.EventsSourceProp}' = '$sfDir', " +
          s"'${CorpusWriter.EventsFingerprintProp}' = " +
          s"'${CorpusWriter.sourceFingerprint(spark, sfDir, "lineitem.parquet")}')")
        val reHash = SparkEntry.queries("q02_pricing_summary")(spark, sfDir)
          .collect().map(_.toString).sorted.mkString("\n")
        require(reHash == plainRef,
          "re-attached lineitem layout changed q02's answer")
        println("[r16] lireuse: re-attached; q02 value identity OK")
      }
    }
    val names = SparkEntry.allDefs.map(_.name)
      .filter(n => wanted.exists(n.contains))
    println(s"[r16] dir=$sfDir iters=$iters load=${ProfileR14.loadavg()} " +
      s"queries=${names.mkString(",")}")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (!sys.env.contains("GRAFT_NO_RELEASE"))
        graft.operators.CacheRegistry.release(blocking = true)
      t
    }
    for (n <- names) {
      run(n) // warm: JIT + codegen + parquet footers
      System.gc()
      val ts = (1 to iters).map(_ => run(n))
      println(f"[r16] $n%-28s load=${ProfileR14.loadavg()}%-6s " +
        ts.map(t => f"$t%8.3f").mkString(" "))
    }
    spark.stop()
  }
}
