package graft.engine

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Shared one-per-JVM SparkSession for the suite (local[4] is plenty for
  * per-event fixtures and keeps startup cost out of every test class).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // same extension set as GraftSession.local(), so the whole suite
      // exercises the native-substitution rule
      .withExtensions(new graft.plans.GraftExtensions)
    Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val mapper = new ObjectMapper()

  /** Structural JSON equality (field order independent). */
  def jsonEq(a: String, b: String): Boolean =
    mapper.readTree(a) == mapper.readTree(b)

  def jsonGet(json: String, field: String): String =
    mapper.readTree(json).get(field).asText()

  def newEngine(
      deliverFn: (String, String, String) => Delivery.Result =
        Delivery.deliver)
      : WebhookEngine =
    new WebhookEngine(spark,
      Files.createTempDirectory("graft-audit").toString, deliverFn)
}

abstract class SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark

  /** The reference's canonical sample payload (tests/conftest.py:85-98). */
  val samplePayload: String =
    """{"field1": "value1", "field2": "value2",
      | "nested": {"key1": "value1", "key2": 123},
      | "items": [{"id": 1, "name": "Item 1"}, {"id": 2, "name": "Item 2"}]}"""
      .stripMargin
}
