package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.GetJsonObject

/** SQL-dialect compatibility shims (SURVEY §7.3): the reference's query
  * channels use a couple of DuckDB spellings Spark lacks.
  */
object SqlCompat {

  /** Register `json_extract(json, path)` as an alias for Spark's
    * `get_json_object` (the reference's analytics examples use the
    * DuckDB spelling, frontend/src/pages/SqlQuery.tsx:38). Like DuckDB's
    * `json_extract_string`, the result is the unquoted string value —
    * the variant the examples compare against string literals.
    */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_extract",
      exprs => GetJsonObject(exprs.head, exprs(1)),
      "built-in")
    ()
  }
}
