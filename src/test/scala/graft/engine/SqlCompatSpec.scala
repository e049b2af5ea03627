package graft.engine

/** Pins for the dialect shims and parameterized queries (SURVEY §7.3,
  * reference src/app.py:202-237).
  */
class SqlCompatSpec extends SparkSpec {
  import SparkSpec._

  test("json_extract alias unquotes like json_extract_string") {
    val e = newEngine()
    e.register(WebhookConfig("/je", "https://example.com/x",
      "SELECT * FROM {{payload}}", None, None))
    e.ingest("/je", """{"type": "user_created", "n": 7}""")
    val rows = e.adHocQuery(
      """SELECT json_extract(payload, '$.type') AS t,
        |       json_extract(payload, '$.n') AS n
        |FROM raw_events""".stripMargin).toOption.get
    assert(rows == Seq(Seq("user_created", "7")))
  }

  test("sqlite_master shim lists the catalog tables (test_db_manager.py:21-33)") {
    val e = newEngine()
    e.refreshSqlViews()
    val names = e.adHocQuery(
      "SELECT name FROM sqlite_master WHERE type = 'table' ORDER BY name")
      .toOption.get.map(_.head.asInstanceOf[String])
    for (t <- Seq("raw_events", "transformed_events", "webhooks",
      "python_udfs", "reference_tables"))
      assert(names.contains(t), s"missing $t in sqlite_master")
  }

  test("named parameters bind (src/app.py:202-224)") {
    val e = newEngine()
    e.register(WebhookConfig("/params", "https://example.com/x",
      "SELECT * FROM {{payload}}", None, None))
    e.ingest("/params", """{"k": 1}""")
    val rows = e.adHocQuery(
      "SELECT COUNT(*) FROM raw_events WHERE source_path = :p",
      Map("p" -> "/params")).toOption.get
    assert(rows == Seq(Seq(1L)))
  }

  test("positional parameters bind (src/app.py:225-231)") {
    val e = newEngine()
    e.register(WebhookConfig("/pos", "https://example.com/x",
      "SELECT * FROM {{payload}}", None, None))
    e.ingest("/pos", """{"k": 1}""")
    val rows = e.adHocQuery(
      "SELECT COUNT(*) FROM raw_events WHERE source_path = ? AND 1 = ?",
      Seq("/pos", 1)).toOption.get
    assert(rows == Seq(Seq(1L)))
  }
}
