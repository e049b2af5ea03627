package graft.engine

import java.nio.file.Files

/** Restart-survival pins: the reference keeps its whole catalog in a
  * DuckDB file; the engine persists catalog/UDF/reference-table state
  * under workDir and rehydrates it on construction.
  */
class PersistenceSpec extends SparkSpec {
  import SparkSpec._

  test("webhooks, UDFs, reference tables and audit survive a restart") {
    val workDir = Files.createTempDirectory("graft-persist").toString

    // --- first engine instance: register everything, process an event
    val e1 = new WebhookEngine(spark, workDir)
    val w = e1.register(WebhookConfig("/durable", "https://example.com/x",
      "SELECT * FROM {{payload}}", Some("keep = true"), Some("owner-1")))
      .toOption.get
    e1.udfs.register(w.id, "shout",
      "def shout(s: String): String = s.toUpperCase")
    e1.refTables.uploadCsv(w.id, "dims", "lookup", "k,v\n1,one\n2,two")
    val ack = e1.ingest("/durable", """{"keep": true, "n": 5}""").toOption.get
    e1.drain() // deferred processing must land before the durability flush
    e1.audit.flush() // audit durability is parquet-flush-based

    // --- second engine instance over the same workDir
    val e2 = new WebhookEngine(spark, workDir)
    val w2 = e2.catalog.byPath("/durable").get
    assert(w2.id == w.id)
    assert(w2.filterQuery.contains("keep = true"))
    assert(w2.owner.contains("owner-1"))

    assert(e2.udfs.forWebhook(w.id).map(_.functionName) == Seq("shout"))
    // rehydrated UDF is callable in a transform
    val out = e2.transformer.transform(w.id,
      s"SELECT udf_${w.id.replace("-", "_")}_shout(s) AS u FROM {{payload}}",
      """{"s": "hi"}""")
    assert(jsonEq(out, """{"u":"HI"}"""))

    // reference table content restored
    val meta = e2.refTables.forWebhook(w.id).head
    assert(spark.table(meta.qualifiedName).count() == 2)

    // audit history visible to the new instance
    assert(e2.transformedFor(ack.eventId).isDefined)
    val rows = e2.adHocQuery(
      "SELECT COUNT(*) FROM raw_events WHERE source_path = '/durable'")
      .toOption.get
    assert(rows == Seq(Seq(1L)))

    // and the restarted engine processes new events end-to-end
    assert(e2.ingest("/durable", """{"keep": true, "n": 6}""").isRight)
  }

  test("hard delete persists across restart") {
    val workDir = Files.createTempDirectory("graft-persist2").toString
    val e1 = new WebhookEngine(spark, workDir)
    val w = e1.register(WebhookConfig("/gone", "https://example.com/x",
      "SELECT * FROM {{payload}}", None, None)).toOption.get
    e1.deleteWebhook(w.id)
    val e2 = new WebhookEngine(spark, workDir)
    assert(e2.catalog.byPath("/gone").isEmpty)
  }
}
