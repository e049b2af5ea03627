package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.GetJsonObject

import graft.functions.JsonExtractDuck

/** SQL-dialect compatibility shims (SURVEY §7.3): the reference's query
  * channels use a couple of DuckDB spellings Spark lacks. Both DuckDB
  * extraction variants are installed with DuckDB's exact quoting
  * semantics, pinned in SqlCompatSpec:
  *
  *  - `json_extract(json, path)` → JSON text, strings QUOTED
  *    ([[graft.functions.JsonExtractDuck]]) — what DuckDB renders for
  *    its JSON-typed result (the reference's analytics example,
  *    frontend/src/pages/SqlQuery.tsx:38, groups on this value);
  *  - `json_extract_string(json, path)` → unquoted string value
  *    (Spark's `get_json_object` has exactly these semantics).
  */
object SqlCompat {

  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_extract",
      exprs => JsonExtractDuck(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_extract_string",
      exprs => GetJsonObject(exprs.head, exprs(1)),
      "built-in")
    ()
  }
}
