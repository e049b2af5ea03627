package graft.engine

/** Pins for the dialect shims and parameterized queries (SURVEY §7.3,
  * reference src/app.py:202-237).
  */
class SqlCompatSpec extends SparkSpec {
  import SparkSpec._

  test("json_extract keeps DuckDB's quoted-JSON semantics on the SQL channel") {
    val e = newEngine()
    e.register(WebhookConfig("/je", "https://example.com/x",
      "SELECT * FROM {{payload}}", None, None))
    e.ingest("/je", """{"type": "user_created", "n": 7}""")
    val rows = e.adHocQuery(
      """SELECT json_extract(payload, '$.type') AS t,
        |       json_extract(payload, '$.n') AS n
        |FROM raw_events""".stripMargin).toOption.get
    // DuckDB 1.0.0: json_extract returns JSON text — strings QUOTED,
    // numbers bare — so a ported comparison against '"user_created"'
    // keeps working
    assert(rows == Seq(Seq("\"user_created\"", "7")))
  }

  test("json_extract / json_extract_string match DuckDB for every JSON type") {
    val e = newEngine()
    e.refreshSqlViews()
    val j = """{"t":"x","n":7,"f":7.5,"b":true,"z":null,""" +
      """"o":{"k":1},"arr":[1,{"a":"b"}]}"""
    // expected pairs verified against DuckDB 1.0.0:
    //   (path, json_extract CAST VARCHAR, json_extract_string)
    val expected = Seq(
      ("$.t", "\"x\"", "x"), // string: quoted vs unquoted
      ("$.n", "7", "7"), // integer: bare both ways
      ("$.f", "7.5", "7.5"), // float
      ("$.b", "true", "true"), // boolean
      ("$.z", null, null), // JSON null → SQL NULL in BOTH variants
      ("$.o", """{"k":1}""", """{"k":1}"""), // object: compact JSON
      ("$.arr", """[1,{"a":"b"}]""", """[1,{"a":"b"}]"""), // array
      ("$.arr[1].a", "\"b\"", "b"), // nested array step
      ("$.missing", null, null)) // absent path → SQL NULL
    for ((path, quoted, unquoted) <- expected) {
      val row = e.adHocQuery(
        s"""SELECT json_extract('$j', '$path'),
           |       json_extract_string('$j', '$path')""".stripMargin)
        .toOption.get.head
      assert(row(0) == quoted, s"json_extract($path)")
      assert(row(1) == unquoted, s"json_extract_string($path)")
    }
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
