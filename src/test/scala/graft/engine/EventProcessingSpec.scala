package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper

/** Ports of the reference's operator-level pins
  * (tests/test_event_processing.py): transform shaping, filter gate
  * semantics, and the full process_webhook flow including the
  * filtered-out and delivery-failure audit rows.
  */
class EventProcessingSpec extends SparkSpec {
  import SparkSpec._

  private val mapper = new ObjectMapper()

  private def transformer = new PayloadTransformer(spark)

  // --- TestEventTransformation ---

  test("transform: simple projection (test_event_processing.py:23-36)") {
    val out = transformer.transform("w1",
      "SELECT field1, field2 FROM {{payload}}", samplePayload)
    assert(jsonEq(out, """{"field1":"value1","field2":"value2"}"""))
  }

  test("transform: computed column a+b=30 (test_event_processing.py:39-50)") {
    val out = transformer.transform("w1",
      "SELECT a, b, a + b AS sum FROM {{payload}}", """{"a": 10, "b": 20}""")
    assert(jsonEq(out, """{"a":10,"b":20,"sum":30}"""))
  }

  test("transform: nested dot access (test_event_processing.py:53-71)") {
    val out = transformer.transform("w1",
      """SELECT field1, nested.key1 AS nested_key1,
        |       nested.key2 AS nested_key2 FROM {{payload}}""".stripMargin,
      samplePayload)
    assert(jsonEq(out,
      """{"field1":"value1","nested_key1":"value1","nested_key2":123}"""))
  }

  test("transform: multi-row {'results':[...]} (test_event_processing.py:74-95)") {
    val payload =
      """[{"id": 1, "name": "Item 1"}, {"id": 2, "name": "Item 2"},
        | {"id": 3, "name": "Item 3"}]""".stripMargin
    val out = transformer.transform("w1",
      "SELECT id, name FROM {{payload}}", payload)
    val tree = mapper.readTree(out)
    assert(tree.has("results"))
    val results = tree.get("results")
    assert(results.size() == 3)
    assert((1 to 3).forall(i => results.get(i - 1).get("id").asInt() == i))
    assert(results.get(0).get("name").asText() == "Item 1")
  }

  test("transform: empty result is {} (test_event_processing.py:98-108)") {
    val out = transformer.transform("w1",
      "SELECT * FROM {{payload}} WHERE field1 = 'nonexistent'",
      """{"field1": "value1", "field2": "value2"}""")
    assert(out == "{}")
  }

  // --- TestEventFiltering ---

  test("filter: passes on match (test_event_processing.py:111-119)") {
    assert(transformer.applyFilter("w1", "field1 = 'value1'", samplePayload))
  }

  test("filter: fails on mismatch (test_event_processing.py:122-136)") {
    assert(!transformer.applyFilter("w1", "field1 = 'wrong_value'",
      samplePayload))
  }

  test("filter: AND conjunction (test_event_processing.py:139-148)") {
    assert(transformer.applyFilter("w1",
      "field1 = 'value1' AND field2 = 'value2'", samplePayload))
  }

  test("filter: nested field (test_event_processing.py:151-160)") {
    assert(transformer.applyFilter("w1", "nested.key1 = 'value1'",
      samplePayload))
  }

  // null filter handled at the pipeline level: no filter → always pass
  // (test_event_processing.py:163-171); pinned in the process tests below.

  // --- TestWebhookProcessing ---

  private def registeredEngine(
      filter: Option[String] = Some("field1 = 'value1'"),
      deliver: (String, String, String) => Delivery.Result =
        Delivery.deliver) = {
    val e = newEngine(deliver)
    val w = e.register(WebhookConfig("/test-webhook",
      "https://example.com/webhook", "SELECT * FROM {{payload}}",
      filter, Some("test-owner"))).toOption.get
    (e, w)
  }

  test("process: success path audits success=true (test_event_processing.py:174-236)") {
    val (e, w) = registeredEngine()
    val raw = e.audit.logRaw(w.sourcePath, samplePayload)
    val res = e.process(w, raw.id, samplePayload)
    assert(!res.filtered && res.success)
    assert(res.responseCode.contains(200)) // simulated example.com delivery
    val rows = e.adHocQuery(
      s"SELECT success, response_code FROM transformed_events WHERE raw_event_id = '${raw.id}'")
      .toOption.get
    assert(rows == Seq(Seq(true, 200)))
  }

  test("process: filtered-out audits the exact reference row (test_event_processing.py:239-296)") {
    val (e, w) = registeredEngine(filter = Some("field1 = 'nonexistent_value'"))
    val raw = e.audit.logRaw(w.sourcePath, samplePayload)
    val res = e.process(w, raw.id, samplePayload)
    assert(res.filtered && !res.success)
    val rows = e.adHocQuery(
      s"""SELECT success, response_body, transformed_payload
         |FROM transformed_events WHERE raw_event_id = '${raw.id}'""".stripMargin)
      .toOption.get
    assert(rows.size == 1)
    assert(rows.head(0) == false)
    assert(rows.head(1) == "Filtered out by filter_query")
    assert(rows.head(2) == "{}")
  }

  test("process: delivery failure audits success=false (test_event_processing.py:299-351)") {
    val (e, w) = registeredEngine(deliver = (_, _, _) =>
      Delivery.Result(success = false, None, "Connection error: refused"))
    val raw = e.audit.logRaw(w.sourcePath, samplePayload)
    val res = e.process(w, raw.id, samplePayload)
    assert(!res.filtered && !res.success)
    val rows = e.adHocQuery(
      s"SELECT success, response_body FROM transformed_events WHERE raw_event_id = '${raw.id}'")
      .toOption.get
    assert(rows == Seq(Seq(false, "Connection error: refused")))
  }

  test("process: transform error audits 'Error: …' row (src/app.py:1230-1244)") {
    val e = newEngine()
    val w = e.register(WebhookConfig("/bad-transform",
      "https://example.com/webhook",
      "SELECT no_such_column + 1 FROM {{payload}}", None, None))
      .toOption.get
    val raw = e.audit.logRaw(w.sourcePath, samplePayload)
    val res = e.process(w, raw.id, samplePayload)
    assert(!res.success)
    assert(res.responseBody.startsWith("Error: "))
    val rows = e.adHocQuery(
      s"SELECT success, response_body FROM transformed_events WHERE raw_event_id = '${raw.id}'")
      .toOption.get
    assert(rows.head(0) == false)
    assert(rows.head(1).asInstanceOf[String].startsWith("Error: "))
  }

  test("process: no filter always passes (test_event_processing.py:163-171)") {
    val (e, w) = registeredEngine(filter = None)
    val raw = e.audit.logRaw(w.sourcePath, samplePayload)
    assert(e.process(w, raw.id, samplePayload).success)
  }
}
