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
  def batchFilterPlan(events: DataFrame, filterQuery: String,
      schema: Option[StructType] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    explodedBatch(events, schema)
      .where(expr(filterQuery))
      .select(col("__graft_eid").as("__eid"))
      .distinct()
  }

  /** Union schema of a batch's payloads — ONE inference job; callers
    * running both the filter and the transform channel over the same
    * batch share the result instead of inferring twice.
    */
  def inferBatchSchema(events: DataFrame): StructType = {
    import spark.implicits._
    spark.read.json(events.select("__json").as[String]).schema
  }

  /** Union-schema exploded relation for a batch of same-webhook events:
    * one schema inference over the whole batch (or the caller-provided
    * [[inferBatchSchema]] result), then every payload parsed against it
    * with the event id and the within-payload row index carried as
    * metadata columns — `(__graft_eid, __graft_idx,
    * <payload columns>)`. Array payloads explode into one row per
    * element (index = element position), exactly the per-event
    * payloadToDf row set.
    */
  private def explodedBatch(events: DataFrame,
      knownSchema: Option[StructType] = None): DataFrame = {
    import org.apache.spark.sql.functions.{array, col, expr, from_json, posexplode, when}
    import org.apache.spark.sql.types.ArrayType
    val schema = knownSchema.getOrElse(inferBatchSchema(events))
    events
      .select(col("__eid"),
        posexplode(when(expr("__json RLIKE '^\\\\s*\\\\['"),
          from_json(col("__json"), ArrayType(schema)))
          .otherwise(array(from_json(col("__json"), schema))))
          .as(Seq("__idx", "__p")))
      .select(col("__eid").as("__graft_eid"), col("__idx").as("__graft_idx"),
        col("__p.*"))
  }

  // ---- set-oriented transform channel ----

  /** Generator function names that multiply rows: per-output-row order
    * within one payload row is generation order per-event, which the
    * batched sort-by-index can't reproduce — so these fall back.
    */
  private val GeneratorFns = Set("explode", "explode_outer", "posexplode",
    "posexplode_outer", "inline", "inline_outer", "stack", "json_tuple")

  /** True when a substituted transform parses to a ROW-WISE plan — only
    * Project / Filter / SubqueryAlias over the single payload relation,
    * with no window functions, subquery expressions, or row-multiplying
    * generators. Aggregates without GROUP BY parse as Project, but the
    * injected pass-through columns then fail analysis (non-grouped
    * reference), so they fall back at the analysis gate instead. Every
    * other shape (Aggregate, Limit, Sort, Distinct, set ops, WITH,
    * joins against reference tables) has a node outside the allowlist.
    */
  private[graft] def isRowWiseSelect(substitutedSql: String): Boolean =
    try {
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation}
      import org.apache.spark.sql.catalyst.expressions.{SubqueryExpression, WindowExpression}
      import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, Project, SubqueryAlias}
      val plan = spark.sessionState.sqlParser.parsePlan(substitutedSql)
      val nodesOk = plan.collect { case n: LogicalPlan => n }.forall {
        case _: Project | _: LFilter | _: SubqueryAlias |
          _: UnresolvedRelation => true
        case _ => false
      }
      def exprBad(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
        e.exists {
          case _: WindowExpression => true
          case _: SubqueryExpression => true
          case f: UnresolvedFunction =>
            GeneratorFns(f.nameParts.last.toLowerCase(java.util.Locale.ROOT))
          case _ => false
        }
      nodesOk && !plan.exists(_.expressions.exists(exprBad))
    } catch { case _: Throwable => false }

  private val SelectHead = "(?i)\\bselect\\b".r

  /** Compile a `{{payload}}` transform ONCE against a batch's union
    * schema and evaluate every event in ONE set-oriented plan. Input:
    * (`__eid`, `__json`) rows; output: (`__eid`, `__transformed`) with
    * the reference's shaping applied per event (1 row → flat object,
    * N rows → {"results": [...]}; events whose rows all fail the
    * transform's own WHERE produce no output row — callers coalesce to
    * "{}"). Returns None when the transform shape requires per-event
    * semantics: arbitrary SQL may aggregate/sort/limit over the
    * SINGLE-EVENT relation, which a batch-wide run would evaluate over
    * the whole batch instead, so only verified row-wise plans batch.
    *
    * Mechanics: the event id and row index are injected as pass-through
    * columns into the outer SELECT (`__graft_eid AS __ge, ...`) — sound
    * because a row-wise plan commutes with adding a constant-per-row
    * column; any shape that would change semantics fails the parse
    * allowlist or the post-injection analysis and falls back. Per-row
    * JSON uses the same Jackson generator as the per-event `toJSON`
    * path, so strings match byte-for-byte; multi-row events reassemble
    * in payload order via the carried index.
    *
    * Same union-schema edge as [[batchFilterPlan]]: an event missing a
    * referenced column reads as null here where the per-event path
    * errors — only reachable with mixed-shape batches.
    */
  def batchTransformPlan(events: DataFrame, transformQuery: String,
      schema: Option[StructType] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{array_join, array_sort, col, collect_list, concat, count, lit, struct, to_json, when, transform => arrTransform}
    if (!isRowWiseSelect(substitute(transformQuery, "__graft_probe")))
      return None
    val view = tempViewName()
    explodedBatch(events, schema).createOrReplaceTempView(view)
    try {
      val substituted = substitute(transformQuery, view)
      val injected = SelectHead.replaceFirstIn(substituted,
        "SELECT __graft_eid AS __ge, __graft_idx AS __gi, ")
      val res = spark.sql(injected) // analyzes eagerly; throws → fallback
      val metaCols = Set("__ge", "__gi", "__graft_eid", "__graft_idx")
      val userCols = res.columns.filterNot(metaCols)
      Some(res
        .select(col("__ge"), col("__gi"),
          to_json(struct(userCols.map(col).toIndexedSeq: _*)).as("__row"))
        .groupBy(col("__ge").as("__eid"))
        .agg(count(lit(1)).as("__n"),
          array_join(arrTransform(
            array_sort(collect_list(struct(col("__gi"), col("__row")))),
            s => s.getField("__row")), ", ").as("__rows"))
        .select(col("__eid"),
          when(col("__n") === 1, col("__rows"))
            .otherwise(concat(lit("{\"results\": ["), col("__rows"),
              lit("]}")))
            .as("__transformed")))
    } catch {
      case _: Throwable => None
    } finally spark.catalog.dropTempView(view) // plan already resolved
  }

  /** Driver-side convenience over [[batchTransformPlan]] for
    * [[WebhookEngine.processBatch]]: Some(eid → shaped JSON) when the
    * transform batched (missing eids mean zero output rows → "{}"),
    * None when it requires the per-event path.
    */
  def batchTransform(events: Seq[(String, String)],
      transformQuery: String): Option[Map[String, String]] = {
    import spark.implicits._
    if (events.isEmpty) return Some(Map.empty)
    try batchTransformPlan(events.toDF("__eid", "__json"), transformQuery)
      .map(_.collect().map(r => r.getString(0) -> r.getString(1)).toMap)
    catch { case _: Throwable => None } // runtime failure → per-event path
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
