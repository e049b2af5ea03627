package graft.engine

/** Ports of tests/test_webhook_management.py: upsert-preserves-id, path
  * normalization, case-sensitive routing, status toggle and soft delete.
  */
class WebhookManagementSpec extends SparkSpec {

  private def cfg(path: String) = WebhookConfig(path,
    "https://example.com/webhook", "SELECT * FROM {{payload}}",
    Some("field1 = 'value1'"), Some("test-owner"))

  test("upsert keyed on source_path preserves id (test_webhook_management.py:44-80)") {
    val c = new WebhookCatalog
    val w1 = c.upsert(cfg("/hook")).toOption.get
    val w2 = c.upsert(cfg("/hook").copy(
      destinationUrl = "https://example.com/v2")).toOption.get
    assert(w1.id == w2.id)
    assert(w2.destinationUrl == "https://example.com/v2")
    assert(c.list().size == 1)
  }

  test("transform without {{payload}} is rejected (src/app.py:64-69)") {
    val c = new WebhookCatalog
    val bad = c.upsert(cfg("/hook").copy(transformQuery = "SELECT 1"))
    assert(bad.isLeft)
    assert(bad.swap.toOption.get.contains("{{payload}}"))
  }

  test("leading slash normalization (test_webhook_management.py:129-148)") {
    val c = new WebhookCatalog
    val w = c.upsert(cfg("no-slash")).toOption.get
    assert(w.sourcePath == "/no-slash")
    assert(c.byPath("/no-slash").isDefined)
  }

  test("path routing is case-sensitive (test_webhook_management.py:111-126)") {
    val c = new WebhookCatalog
    c.upsert(cfg("/CaseSensitive"))
    assert(c.byPath("/CaseSensitive").isDefined)
    assert(c.byPath("/casesensitive").isEmpty)
  }

  test("status toggle twiddles /inactive_<id> prefix (src/app.py:1629-1641)") {
    val c = new WebhookCatalog
    val w = c.upsert(cfg("/toggle-me")).toOption.get
    val off = c.setActive(w.id, active = false).get
    assert(!off.isActive)
    assert(off.sourcePath == s"/inactive_${w.id}/toggle-me")
    // double-deactivate must not stack prefixes
    val off2 = c.setActive(w.id, active = false).get
    assert(off2.sourcePath == off.sourcePath)
    val on = c.setActive(w.id, active = true).get
    assert(on.isActive && on.sourcePath == "/toggle-me")
    // double-activate is a no-op
    assert(c.setActive(w.id, active = true).get.sourcePath == "/toggle-me")
  }

  test("delete is soft when events exist (src/app.py:1705-1763)") {
    val c = new WebhookCatalog
    val w1 = c.upsert(cfg("/with-history")).toOption.get
    val renamed = c.delete(w1.id, hasEvents = true).get
    assert(renamed.sourcePath == s"/inactive_${w1.id}/with-history")
    assert(c.byIdOpt(w1.id).isDefined) // row retained
    val w2 = c.upsert(cfg("/no-history")).toOption.get
    c.delete(w2.id, hasEvents = false)
    assert(c.byIdOpt(w2.id).isEmpty) // hard-deleted
  }

  test("engine cascade delete drops ref tables and UDFs (src/app.py:1705-1763)") {
    val e = SparkSpec.newEngine()
    val w = e.register(cfg("/cascade")).toOption.get
    e.refTables.uploadCsv(w.id, "t1", "", "a,b\n1,2")
    e.udfs.register(w.id, "f", "def f(s: String): String = s")
    assert(e.refTables.forWebhook(w.id).nonEmpty)
    assert(e.udfs.forWebhook(w.id).nonEmpty)
    e.deleteWebhook(w.id)
    assert(e.refTables.forWebhook(w.id).isEmpty)
    assert(e.udfs.forWebhook(w.id).isEmpty)
    assert(e.catalog.byIdOpt(w.id).isEmpty) // no events → hard delete
  }
}
