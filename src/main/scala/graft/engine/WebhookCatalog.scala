package graft.engine

import java.time.Instant
import scala.collection.concurrent.TrieMap

/** In-memory webhook catalog with the reference's exact mutation
  * semantics (src/app.py:253-348, 1600-1763). The catalog is tiny
  * (thousands of rows at most) and driver-resident by design — it is
  * control-plane state, not data — so a concurrent map + lock beats any
  * distributed representation. With a `store`, every mutation snapshots
  * atomically and a restart reloads the catalog (the reference's
  * webhooks table durability, src/app.py:103-114).
  */
final class WebhookCatalog(store: Option[JsonStore] = None) {

  private val byId = new TrieMap[String, Webhook]()

  store.foreach(_.load().foreach { n =>
    val w = Webhook(n.get("id").asText(), n.get("source_path").asText(),
      n.get("destination_url").asText(), n.get("transform_query").asText(),
      Option(n.get("filter_query")).filterNot(_.isNull).map(_.asText()),
      Option(n.get("owner")).filterNot(_.isNull).map(_.asText()),
      Instant.ofEpochMilli(n.path("created_at").asLong(0L)),
      Instant.ofEpochMilli(n.path("updated_at").asLong(0L)))
    byId.put(w.id, w)
  })

  private def persist(): Unit = store.foreach { s =>
    s.save(byId.values.toSeq.sortBy(_.id).map { w =>
      val n = s.newNode()
      n.put("id", w.id)
      n.put("source_path", w.sourcePath)
      n.put("destination_url", w.destinationUrl)
      n.put("transform_query", w.transformQuery)
      w.filterQuery match {
        case Some(f) => n.put("filter_query", f)
        case None => n.putNull("filter_query")
      }
      w.owner match {
        case Some(o) => n.put("owner", o)
        case None => n.putNull("owner")
      }
      n.put("created_at", w.createdAt.toEpochMilli)
      n.put("updated_at", w.updatedAt.toEpochMilli)
      n
    })
  }

  /** Register-or-update keyed on source_path — id is preserved on update
    * (src/app.py:253-317, pinned tests/test_webhook_management.py:44-80).
    */
  def upsert(config: WebhookConfig): Either[String, Webhook] = synchronized {
    WebhookConfig.validateTransform(config.transformQuery).map { _ =>
      val path = WebhookConfig.normalizePath(config.sourcePath)
      val now = Instant.now()
      val existing = byId.values.find(_.sourcePath == path)
      val row = existing match {
        case Some(w) => w.copy(
          destinationUrl = config.destinationUrl,
          transformQuery = config.transformQuery,
          filterQuery = config.filterQuery,
          owner = config.owner.orElse(w.owner),
          updatedAt = now)
        case None => Webhook(Webhook.newId(), path, config.destinationUrl,
          config.transformQuery, config.filterQuery, config.owner, now, now)
      }
      byId.put(row.id, row)
      persist()
      row
    }
  }

  /** Exact, case-sensitive path match (src/app.py:319-348; case
    * sensitivity pinned at tests/test_webhook_management.py:111-126).
    */
  def byPath(sourcePath: String): Option[Webhook] =
    byId.values.find(_.sourcePath == sourcePath)

  def byIdOpt(id: String): Option[Webhook] = byId.get(id)

  def list(): Seq[Webhook] =
    byId.values.toSeq.sortBy(w => (w.updatedAt, w.id)).reverse

  /** Active ⇄ inactive via the /inactive_<id> path-prefix trick
    * (src/app.py:1629-1641).
    */
  def setActive(id: String, active: Boolean): Option[Webhook] = synchronized {
    byId.get(id).map { w =>
      val updated =
        if (active && !w.isActive)
          w.copy(sourcePath = w.sourcePath.stripPrefix(Webhook.InactivePrefix + w.id),
            updatedAt = Instant.now()) match {
            // stored form is /inactive_<id><original_path>
            case x if x.sourcePath.isEmpty => x.copy(sourcePath = "/")
            case x => x
          }
        else if (!active && w.isActive)
          w.copy(sourcePath = Webhook.InactivePrefix + w.id + w.sourcePath,
            updatedAt = Instant.now())
        else w
      byId.put(id, updated)
      persist()
      updated
    }
  }

  /** Delete; if the webhook has processed events, soft-delete by renaming
    * the path instead so audit rows stay resolvable
    * (src/app.py:1705-1763).
    */
  def delete(id: String, hasEvents: Boolean): Option[Webhook] = synchronized {
    byId.get(id).map { w =>
      if (hasEvents) {
        val renamed = if (w.isActive)
          w.copy(sourcePath = Webhook.InactivePrefix + w.id + w.sourcePath,
            updatedAt = Instant.now())
        else w
        byId.put(id, renamed)
        persist()
        renamed
      } else {
        byId.remove(id)
        persist()
        w
      }
    }
  }
}
