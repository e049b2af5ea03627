package graft

import org.apache.spark.sql.functions.{col, lit}

/** DEV-SIDE data scale-up for bench evidence (VERDICT r3 next-round #3
  * and #9): materializes a `factor`× replica of an SF dir with key
  * columns SHIFTED per copy, so joins stay one-to-one within a copy
  * (plain replication would square join outputs) and group/window
  * cardinalities scale the way real data does (factor× more users,
  * orders, documents — not factor× deeper groups). Fixed dimensions
  * (region/nation) are copied once, exactly like a real warehouse.
  *
  * Each copy appends its own parquet files, so the output is the
  * multi-file layout a table this size actually has — scans parallelize
  * across copies without any repartition.
  *
  * The replica feeds Bench (`SPARK_GRAFT_SF_DIR=<outDir>`) and
  * tools/bench_duckdb.py so the Spark-vs-DuckDB ratio can be measured
  * at a scale where fixed per-action overheads stop dominating.
  *
  * Usage: runMain graft.ScaleUp <sfDir> <outDir> <factor>
  */
object ScaleUp {

  /** Shift must exceed every key's max value (all keys here are well
    * under 1e8 at sf0.1); BIGINT keys never overflow at any sane factor.
    */
  val Shift = 100000000L

  val shiftCols: Map[String, Seq[String]] = Map(
    "region" -> Nil, // fixed dim: one copy
    "nation" -> Nil, // fixed dim: one copy
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val factor = args(2).toInt
    // optional 4th arg: regex of table names to replicate (default all)
    // — a single-table sweep (e.g. the embeddings crossover harness)
    // shouldn't pay for a full replica
    val only = args.lift(3).getOrElse(".*").r
    val spark = GraftSession.local()
    Tables.all.filter(t => only.findFirstIn(t).isDefined).foreach { t =>
      val src = spark.read.parquet(s"$sfDir/$t.parquet")
      val copies = if (shiftCols(t).isEmpty) 1 else factor
      (0 until copies).foreach { i =>
        val shifted = shiftCols(t).foldLeft(src) { (d, c) =>
          d.withColumn(c, col(c) + lit(i * Shift))
        }
        shifted.write.mode(if (i == 0) "overwrite" else "append")
          .parquet(s"$outDir/$t.parquet")
      }
      println(s"[scaleup] $t x$copies")
    }
    spark.stop()
  }
}
