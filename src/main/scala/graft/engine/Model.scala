package graft.engine

import java.time.Instant
import java.util.UUID

/** Catalog + audit row types (reference: the five fixed tables created at
  * src/app.py:98-169). UUIDs are strings (Spark has no UUID type);
  * timestamps are epoch-micros longs internally and rendered ISO at the
  * API edge.
  */

/** Registration request (reference: pydantic WebhookConfig, src/app.py:48-69). */
final case class WebhookConfig(
    sourcePath: String,
    destinationUrl: String,
    transformQuery: String,
    filterQuery: Option[String] = None,
    owner: Option[String] = None)

object WebhookConfig {
  /** Path gets a leading '/' (src/app.py:57-62). */
  def normalizePath(p: String): String =
    if (p.startsWith("/")) p else "/" + p

  /** Transform must contain the payload placeholder (src/app.py:64-69). */
  def validateTransform(q: String): Either[String, String] =
    if (q.contains("{{payload}}")) Right(q)
    else Left("transform_query must contain {{payload}} placeholder")
}

/** A persisted webhook (catalog row, src/app.py:103-114). */
final case class Webhook(
    id: String,
    sourcePath: String,
    destinationUrl: String,
    transformQuery: String,
    filterQuery: Option[String],
    owner: Option[String],
    createdAt: Instant,
    updatedAt: Instant) {
  /** Soft-deleted / deactivated webhooks carry the /inactive_ prefix
    * (src/app.py:1629-1641, 1746-1753).
    */
  def isActive: Boolean = !sourcePath.startsWith(Webhook.InactivePrefix)
}

object Webhook {
  val InactivePrefix = "/inactive_"
  def newId(): String = UUID.randomUUID().toString
}

/** Audit row for every received event (raw_events, src/app.py:117-124). */
final case class RawEvent(
    id: String,
    timestampMicros: Long,
    source_path: String,
    payload: String)

/** Audit row for every processing outcome (transformed_events,
  * src/app.py:127-141).
  */
final case class TransformedEvent(
    id: String,
    raw_event_id: String,
    webhook_id: String,
    timestampMicros: Long,
    transformed_payload: String,
    destination_url: String,
    success: Boolean,
    response_code: Option[Int],
    response_body: String)

/** Reference-table metadata (reference_tables, src/app.py:144-154). */
final case class RefTableMeta(
    id: String,
    webhookId: String,
    tableName: String,
    qualifiedName: String,
    description: String,
    createdAt: Instant,
    updatedAt: Instant)

/** Scalar-UDF metadata; only source text is durable (python_udfs,
  * src/app.py:157-167).
  */
final case class UdfMeta(
    id: String,
    webhookId: String,
    functionName: String,
    qualifiedName: String,
    functionCode: String,
    createdAt: Instant,
    updatedAt: Instant)

/** Outcome of one event through the pipeline (process_webhook,
  * src/app.py:1113-1244).
  */
final case class ProcessResult(
    rawEventId: String,
    filtered: Boolean,
    success: Boolean,
    transformedJson: Option[String],
    responseCode: Option[Int],
    responseBody: String)
