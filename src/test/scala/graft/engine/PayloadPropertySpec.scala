package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for payload-shape robustness (SURVEY §5's planned
  * third leg): the reference pins behavior with 3 fixed payloads; these
  * drive the transform/filter channels with GENERATED shapes — the
  * dimension where per-event dynamic schema inference can break.
  *
  * Case counts are kept small (each case runs Spark jobs).
  */
class PayloadPropertySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def spark = SparkSpec.spark
  private lazy val transformer = new PayloadTransformer(spark)

  /** Drive a generator with fixed seeds (deterministic, replayable;
    * scalacheck's scalatest bridge is not in the offline dep set).
    */
  private def forAll[T](gen: Gen[T], cases: Int = 10)(body: T => Unit): Unit = {
    var executed = 0
    (0 until cases).foreach { i =>
      gen(Gen.Parameters.default.withSize(8), Seed(42L + i)).foreach { v =>
        executed += 1
        body(v)
      }
    }
    assert(executed > 0, "generator produced no cases")
  }

  private val keyGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s.take(12)),
    Gen.choose(-1000000L, 1000000L),
    Gen.choose(-1000.0, 1000.0).map(d => math.rint(d * 100) / 100),
    Gen.oneOf(true, false))

  /** Flat object with 1..5 distinct keys and scalar values. */
  private val flatObjGen: Gen[Map[String, Any]] = for {
    n <- Gen.choose(1, 5)
    keys <- Gen.listOfN(n, keyGen).map(_.distinct)
    vals <- Gen.listOfN(keys.size, scalarGen)
  } yield keys.zip(vals).toMap

  /** Payload with optional nesting: flat scalars + one nested object. */
  private val nestedObjGen: Gen[Map[String, Any]] = for {
    flat <- flatObjGen
    nested <- flatObjGen
  } yield flat + ("nested" -> nested)

  private def toJson(m: Map[String, Any]): String = {
    val node = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach {
      case (k, v: String) => node.put(k, v)
      case (k, v: Long) => node.put(k, v)
      case (k, v: Double) => node.put(k, v)
      case (k, v: Boolean) => node.put(k, v)
      case (k, v: Map[_, _]) =>
        node.set[com.fasterxml.jackson.databind.node.ObjectNode](
          k, mapper.readTree(toJson(v.asInstanceOf[Map[String, Any]]))
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
      case (k, null) => node.putNull(k)
      case (k, v) => node.put(k, String.valueOf(v))
    }
    mapper.writeValueAsString(node)
  }

  test("SELECT * round-trips any generated flat payload") {
    forAll(flatObjGen) { payload =>
      val json = toJson(payload)
      val out = transformer.transform("prop-w", "SELECT * FROM {{payload}}",
        json)
      assert(SparkSpec.jsonEq(out, json),
        s"round-trip mismatch: in=$json out=$out")
    }
  }

  test("nested dot-access projects any generated nested key") {
    forAll(nestedObjGen) { payload =>
      val nested = payload("nested").asInstanceOf[Map[String, Any]]
      val key = nested.keys.min // deterministic pick
      val out = transformer.transform("prop-w",
        s"SELECT nested.`$key` AS x FROM {{payload}}", toJson(payload))
      val expected = toJson(Map("x" -> nested(key)))
      assert(SparkSpec.jsonEq(out, expected),
        s"dot access mismatch: payload=${toJson(payload)} out=$out")
    }
  }

  test("filter gate agrees with predicate evaluation on generated ints") {
    val caseGen = for {
      obj <- flatObjGen
      n <- Gen.choose(-100L, 100L)
      threshold <- Gen.choose(-100L, 100L)
    } yield (obj + ("n" -> n), n, threshold)
    forAll(caseGen) { case (payload, n, threshold) =>
      val keep = transformer.applyFilter("prop-w", s"n > $threshold",
        toJson(payload))
      assert(keep == (n > threshold))
    }
  }

  test("batchFilter agrees with per-event applyFilter on same-shape batches") {
    val batchGen = for {
      size <- Gen.choose(1, 5)
      ns <- Gen.listOfN(size, Gen.choose(-50L, 50L))
      threshold <- Gen.choose(-50L, 50L)
    } yield (ns, threshold)
    forAll(batchGen) { case (ns, threshold) =>
      val events = ns.zipWithIndex.map { case (n, i) =>
        s"e$i" -> s"""{"n": $n, "tag": "t"}"""
      }
      val batch = transformer.batchFilter(events, s"n > $threshold")
      val perEvent = events.filter { case (_, json) =>
        transformer.applyFilter("prop-w", s"n > $threshold", json)
      }.map(_._1).toSet
      assert(batch == perEvent)
    }
  }

  test("array payloads shape as results arrays of the same size") {
    val arrGen = for {
      size <- Gen.choose(2, 6)
      objs <- Gen.listOfN(size, flatObjGen)
    } yield objs.map(o => o + ("k" -> 1L)) // shared key keeps schema sane
    forAll(arrGen) { objs =>
      val json = objs.map(toJson).mkString("[", ",", "]")
      val out = transformer.transform("prop-w",
        "SELECT k FROM {{payload}}", json)
      val tree = mapper.readTree(out)
      assert(tree.get("results").size() == objs.size)
    }
  }
}
