package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DataPipeline, PayloadChannel, QueryDef, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query with (when
  * SQL-expressible) a DuckDB oracle statement; the driver's Verify run at
  * sf0.01 is the correctness gate, Bench at sf0.1 the performance gate.
  */
object SparkEntry {

  /** All correctness-gate query definitions, in registration order. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ DataPipeline.defs ++ PayloadChannel.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_regional_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** The subset Bench times at sf0.1 (headline operators). */
  def benchNames: Seq[String] =
    allDefs.filter(_.headline).map(_.name)
}
