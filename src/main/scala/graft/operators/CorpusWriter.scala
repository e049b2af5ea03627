package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus output layout: the last step of a training-data pipeline is
  * writing the cleaned corpus somewhere a trainer can stream it, and at
  * 100 TB the LAYOUT is the operator — partition pruning and file
  * sizing decide whether downstream reads scan 100 TB or 100 GB.
  *
  *  - `partitionCols` become hive-style directory partitions
  *    (`lang=en/...`), so per-language / per-split readers prune at the
  *    directory level;
  *  - within each partition the data is range-distributed by a
  *    content-stable md5 bucket and capped by `maxRecordsPerFile`, so
  *    file count scales with data volume, files are near-uniform (the
  *    md5 bucket is skew-free even when partition values are skewed),
  *    and reruns produce the same assignment;
  *  - writes are parquet, the layout every engine reads.
  */
object CorpusWriter {

  /** Write `docs` under `outDir` partitioned by `partitionCols`, with
    * at most `maxRecordsPerFile` rows per file. Returns the row count
    * written (one extra action, but a write this size always wants a
    * written-count audit line).
    */
  def writePartitioned(docs: DataFrame, outDir: String,
      partitionCols: Seq[String] = Seq("lang"),
      maxRecordsPerFile: Int = 1000000,
      buckets: Int = 32): Long = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val withBucket = docs.withColumn("graft_bucket",
      (Dedup.hexPrefix(
        org.apache.spark.sql.functions.md5(
          col("doc_id").cast("string").cast("binary"))) % buckets))
    withBucket
      .repartition(partitionCols.map(col) :+ col("graft_bucket"): _*)
      .drop("graft_bucket")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
    docs.sparkSession.read.parquet(outDir).count()
  }

  /** Write `df` as a BUCKETED managed table: hash-bucketed and sorted
    * by `bucketCol` into `buckets` files per partition. This is the
    * layout that makes the recurring joins of a curation stack — docs ⋈
    * embeddings, docs ⋈ dedup labels, corpus ⋈ yesterday's corpus
    * (q77-style incremental dedup) — SHUFFLE-FREE: two tables bucketed
    * the same way join with zero Exchange on either side (pinned by
    * spec against the executed plan), so the join cost at 100 TB is a
    * local merge per bucket instead of re-shuffling both corpora on
    * every run. The bucket count is a real tuning knob: it fixes join
    * parallelism and should be sized so one bucket of the LARGER table
    * fits an executor's memory (e.g. 100 TB / 8192 buckets ≈ 12 GB).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Default table name for the user_id-bucketed events layout. */
  val DefaultEventsTable = "graft_events_by_user"

  /** Table property recording which source the bucketed events were
    * written FROM, so [[bucketedEvents]] only substitutes the layout
    * for queries over that same source (a layout written from last
    * week's extract must never answer this week's query).
    */
  val EventsSourceProp = "graft.events.source"

  /** Write the events stream as a user_id-bucketed, (user_id, ts)-sorted
    * managed table — the layout that makes EVERY per-user analytic
    * shuffle-free: sessionization (q22), session features (q75),
    * inter-arrival profiles (q110), funnels (q63), transitions,
    * retention all require nothing more than "rows of one user
    * co-located" (`ClusteredDistribution` on user_id, or on a superset
    * key like (user_id, event_type), which a HashPartitioning(user_id)
    * scan satisfies — Spark's subset rule). On plain parquet each of
    * those pays a full-corpus Exchange on user_id per query
    * (ProfileQ22Decomp measured that Exchange alone exceeding the
    * oracle's whole query at 50×); bucketed, the shuffle happens ONCE
    * at ingest and amortizes across every per-user query forever —
    * at 100 TB the event firehose is written this way from day one.
    * Schema is preserved verbatim, so consumers are layout-agnostic;
    * pass `sourceDir` to let [[graft.Tables.events]] auto-substitute
    * the layout for reads of that source.
    */
  def writeEvents(events: DataFrame, table: String = DefaultEventsTable,
      buckets: Int = 32, sourceDir: Option[String] = None): Unit = {
    events.write
      .mode("overwrite")
      .bucketBy(buckets, "user_id")
      .sortBy("user_id", "ts")
      .format("parquet")
      .saveAsTable(table)
    sourceDir.foreach { d =>
      events.sparkSession.sql(
        s"ALTER TABLE $table SET TBLPROPERTIES ('$EventsSourceProp' = '$d')")
    }
  }

  /** The bucketed events layout for `sourceDir`, when one has been
    * written and tagged via [[writeEvents]] in this catalog — None
    * otherwise (including when a table of the right name exists but
    * was written from a DIFFERENT source: the property must match).
    */
  def bucketedEvents(spark: org.apache.spark.sql.SparkSession,
      sourceDir: String, table: String = DefaultEventsTable)
      : Option[DataFrame] =
    if (!spark.catalog.tableExists(table)) None
    else {
      val props = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .properties
      if (props.get(EventsSourceProp).contains(sourceDir))
        Some(spark.table(table))
      else None
    }
}
