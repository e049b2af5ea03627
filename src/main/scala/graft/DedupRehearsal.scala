package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, TextAnalysis}

/** DEV-SIDE end-to-end rehearsal of the training-data dedup pipeline at
  * a scaled corpus (VERDICT r3 next-round #9): runs the composed
  * exact-dedup → MinHash-LSH near-dup → dedup-corpus-materialization
  * flow over a `graft.ScaleUp` replica of `documents` and reports
  * wall-time plus total shuffle read/write per stage, converting the
  * "100 TB design notes" into a measured scaling data point.
  *
  * A ScaleUp replica is a particularly hostile dedup input: every text
  * appears `factor`× (shifted doc_ids), so exact groups are huge and
  * every near-dup candidate bucket is saturated — the worst case for
  * any candidate-generation strategy that isn't properly blocked.
  *
  * Usage: runMain graft.DedupRehearsal <docsParquetDir> (file or dir)
  */
object DedupRehearsal {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val spark = GraftSession.local()

    val shuffleRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffleRead.addAndGet(
          s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    val docs = spark.read.parquet(docsPath)
    val nDocs = docs.count()

    def timed(name: String)(df: => DataFrame): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val out = df
      out.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = out.count() // second pass; row count for the report
      (name, secs, rows)
    }

    // One representative doc per exact-duplicate class: near-dup LSH
    // runs over UNIQUE texts, the production composition order — running
    // LSH on the raw corpus makes the candidate AND output pair sets
    // quadratic in the duplication factor (every bucket holds every
    // copy), which "naive" below demonstrates by measurement.
    val reps: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, md5, row_number}
      docs.withColumn("__rn", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .where(col("__rn") === 1).drop("__rn")
    }

    val stages = Seq(
      timed("exact_dedup")(Dedup.exactGroups(docs)),
      timed("dedup_corpus")(TextAnalysis.dedupedCorpus(docs)),
      timed("minhash_on_representatives")(Dedup.nearDupPairs(reps)),
      timed("minhash_naive_full_corpus")(Dedup.nearDupPairs(docs)))

    // listener events are posted async; give the bus a moment to settle
    Thread.sleep(2000)
    val qs = stages.map { case (n, s, r) =>
      s""""$n":{"sec":$s,"rows":$r}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"dedup_rehearsal","n_docs":$nDocs,""" +
      s""""stages":$qs,""" +
      s""""shuffle_read_mb":${shuffleRead.get() / 1048576},""" +
      s""""shuffle_write_mb":${shuffleWrite.get() / 1048576}}""")
    spark.stop()
  }
}
