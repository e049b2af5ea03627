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
}
