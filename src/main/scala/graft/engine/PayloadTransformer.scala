package graft.engine

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The event hot path: payload JSON → relation → transform / filter
  * (reference operators P1/P2/P3, src/app.py:434-579).
  *
  * Spark-first differences from the reference, deliberately:
  *  - no LIMIT-0 column probe — `df.schema` is free from the analyzer
  *    (the reference runs every transform twice, src/app.py:464,475);
  *  - inferred payload schemas are cached per (webhook, payload shape) so
  *    steady-state events skip schema inference entirely;
  *  - the filter gate is `count > 0` over the payload relation, executed
  *    as one tiny local plan, not a round-trip per SURVEY §2.1 P3.
  */
final class PayloadTransformer(spark: SparkSession) {

  import org.apache.spark.sql.types.StructType
  import scala.collection.concurrent.TrieMap

  /** schema cache key = webhookId + structural hash of the payload's
    * key-shape (names + nesting, not values).
    */
  private val schemaCache = new TrieMap[String, StructType]()

  /** JSON payload (object or array of objects, src/app.py:451-454) to a
    * 1..N-row DataFrame. Nested objects become StructType columns, so
    * `nested.key1` dot paths work natively.
    */
  def payloadToDf(webhookId: String, payloadJson: String): DataFrame = {
    import spark.implicits._
    val key = webhookId + "#" + shapeHash(payloadJson)
    schemaCache.get(key) match {
      case Some(schema) =>
        spark.read.schema(schema).json(Seq(payloadJson).toDS())
      case None =>
        val df = spark.read.json(Seq(payloadJson).toDS())
        schemaCache.putIfAbsent(key, df.schema)
        df
    }
  }

  /** Structural hash: field names and nesting only, cheap single pass. */
  private def shapeHash(json: String): Int = {
    var h = 17
    var inString = false
    var prev = ' '
    var i = 0
    while (i < json.length) {
      val c = json.charAt(i)
      if (inString) {
        if (c == '"' && prev != '\\') inString = false else h = h * 31 + c
      } else c match {
        case '"' => inString = true; h = h * 31 + 7
        case '{' | '}' | '[' | ']' | ':' | ',' => h = h * 31 + c
        case _ => // values outside strings don't affect shape
      }
      prev = c
      i += 1
    }
    h
  }

  /** Run a `{{payload}}` transform over one payload; returns the shaped
    * JSON per the reference's contract (src/app.py:467-504):
    * one row → flat object, N rows → {"results": [...]}, zero → {}.
    */
  def transform(webhookId: String, transformQuery: String,
      payloadJson: String): String = {
    val view = tempViewName()
    val df = payloadToDf(webhookId, payloadJson)
    df.createOrReplaceTempView(view)
    try {
      val result = spark.sql(substitute(transformQuery, view))
      shapeResult(result)
    } finally spark.catalog.dropTempView(view)
  }

  /** Filter gate: bare WHERE-condition over the payload relation;
    * true = keep (src/app.py:524-579). Null / no-match → filtered out.
    */
  def applyFilter(webhookId: String, filterQuery: String,
      payloadJson: String): Boolean = {
    val view = tempViewName()
    payloadToDf(webhookId, payloadJson).createOrReplaceTempView(view)
    try {
      spark.sql(s"SELECT count(*) AS c FROM $view WHERE $filterQuery")
        .head().getLong(0) > 0
    } finally spark.catalog.dropTempView(view)
  }

  /** Set-oriented filter gate for a micro-batch of SAME-WEBHOOK events:
    * one Spark job evaluates the bare condition over all payloads, with
    * the event id as a metadata column; returns the ids that pass.
    * Semantics match per-event applyFilter because the filter contract
    * is a row-wise WHERE condition (src/app.py:524-579).
    */
  def batchFilter(events: Seq[(String, String)],
      filterQuery: String): Set[String] = {
    import spark.implicits._
    if (events.isEmpty) return Set.empty
    batchFilterPlan(events.toDF("__eid", "__json"), filterQuery)
      .collect()
      .map(_.getString(0))
      .toSet
  }

  /** The distributed form of [[batchFilter]]: input is a DataFrame of
    * (`__eid`, `__json`) rows; output is the single-column DataFrame of
    * kept `__eid`s — NO driver collect, so the streaming ingestion path
    * can semi/anti-join it against the batch without ever materializing
    * raw payloads driver-side.
    *
    * Semantics: infer a union schema from the batch's payloads
    * (spark.read.json flattens top-level arrays into rows, so the
    * inferred struct covers array elements too), then parse each payload
    * against it alongside its event id. Array payloads parse as
    * ArrayType(schema) and explode — keep = at least one row matches,
    * exactly the per-event COUNT(*)>0 gate. Known edge vs the per-event
    * path: an event MISSING a filtered column reads as null here
    * (filtered out) where the per-event path raises and audits an
    * "Error:" row — only reachable with mixed-shape batches.
    */
  def batchFilterPlan(events: DataFrame, filterQuery: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, explode, expr, from_json, when}
    import org.apache.spark.sql.types.ArrayType
    val schema = spark.read.json(events.select("__json").as[String]).schema
    events
      .select(col("__eid"),
        explode(when(expr("__json RLIKE '^\\\\s*\\\\['"),
          from_json(col("__json"), ArrayType(schema)))
          .otherwise(array(from_json(col("__json"), schema)))).as("__p"))
      .select(col("__eid"), col("__p.*"))
      .where(expr(filterQuery))
      .select("__eid")
      .distinct()
  }

  /** {{payload}} macro expansion (src/app.py:462) — textual, same as the
    * reference; the substituted text then goes through the full Catalyst
    * analyzer.
    */
  def substitute(transformQuery: String, view: String): String =
    transformQuery.replace("{{payload}}", view)

  def tempViewName(): String =
    "payload_" + UUID.randomUUID().toString.replace("-", "_")

  /** Result shaping with type round-trip: toJSON preserves schema types
    * (ints stay ints, booleans stay booleans) unlike stringified rows.
    */
  def shapeResult(df: DataFrame): String = {
    val rows = df.toJSON.collect()
    rows.length match {
      case 0 => "{}"
      case 1 => rows(0)
      case _ => rows.mkString("{\"results\": [", ", ", "]}")
    }
  }
}
