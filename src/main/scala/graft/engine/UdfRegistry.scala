package graft.engine

import java.security.MessageDigest
import java.time.Instant
import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF1, UDF2, UDF3}
import org.apache.spark.sql.types._

/** Runtime-registered scalar UDFs from *source text* (reference P5/P6,
  * src/app.py:673-834): the engine accepts a Scala function definition as
  * a string, compiles it in-process (scala-compiler ships with Spark),
  * and registers it as `udf_<webhookId>_<name>` for use inside transform
  * SQL.
  *
  * Capability contract reproduced from the reference:
  *  - name mangling `udf_<webhook_id with - → _>_<fn>` (src/app.py:713-714);
  *  - return type from the declared annotation, default string
  *    (src/app.py:726-734);
  *  - re-registration overwrites (no connection juggling needed — Spark's
  *    FunctionRegistry replaces in place, src/app.py:745-755);
  *  - invalid source is rejected at registration
  *    (tests/test_reference_and_udf.py:432-444);
  *  - null-in → null-out for reference-shaped str→str functions;
  *  - only source text is durable; functions rehydrate from source, with
  *    a content-hash compile cache so rehydration is free per event
  *    (the reference re-exec's on every event, src/app.py:1148).
  *
  * Scale note: the compiled closure is serialized to executors like any
  * Spark UDF; compilation happens once on the driver per distinct source.
  */
final class UdfRegistry(spark: SparkSession) {

  private val meta = new TrieMap[String, UdfMeta]() // qualifiedName → meta
  private val compileCache = new TrieMap[String, AnyRef]() // sha → fn

  private lazy val toolbox = {
    import scala.tools.reflect.ToolBox
    scala.reflect.runtime.currentMirror.mkToolBox()
  }

  private val DefSig =
    """(?s).*def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\)\s*:\s*([A-Za-z.\[\]]+)\s*=.*""".r

  def qualifiedName(webhookId: String, functionName: String): String =
    s"udf_${webhookId.replace("-", "_")}_$functionName"

  /** Compile + register. Returns the SQL-callable qualified name. */
  def register(webhookId: String, functionName: String,
      functionCode: String): Either[String, UdfMeta] = synchronized {
    val parsed = functionCode match {
      case DefSig(name, params, ret) if name == functionName =>
        Right((params.trim, ret.trim))
      case DefSig(name, _, _) =>
        Left(s"Function '$functionName' not found in code (found '$name')")
      case _ =>
        Left(s"Function '$functionName' not found in code or invalid syntax")
    }
    parsed.flatMap { case (params, ret) =>
      compile(functionCode, functionName).map { fn =>
        val paramTypes = if (params.isEmpty) Nil
          else params.split(",").toSeq.map(_.split(":").last.trim)
        val qname = qualifiedName(webhookId, functionName)
        registerWithSpark(qname, fn, paramTypes, ret)
        val now = Instant.now()
        val row = meta.get(qname) match {
          case Some(m) => m.copy(functionCode = functionCode, updatedAt = now)
          case None => UdfMeta(UUID.randomUUID().toString, webhookId,
            functionName, qname, functionCode, now, now)
        }
        meta.put(qname, row)
        row
      }
    }
  }

  /** Rehydrate every UDF belonging to a webhook from stored source
    * (reference P6, src/app.py:787-834) — cheap here because of the
    * compile cache; exists so function definitions survive restarts.
    */
  def loadWebhookUdfs(webhookId: String): Seq[UdfMeta] =
    forWebhook(webhookId).flatMap(m =>
      register(m.webhookId, m.functionName, m.functionCode).toOption)

  def forWebhook(webhookId: String): Seq[UdfMeta] =
    meta.values.filter(_.webhookId == webhookId).toSeq.sortBy(_.functionName)

  def list(): Seq[UdfMeta] = meta.values.toSeq.sortBy(_.qualifiedName)

  def delete(webhookId: String): Int = {
    val doomed = forWebhook(webhookId)
    doomed.foreach(m => meta.remove(m.qualifiedName))
    doomed.size
  }

  // ---- compilation ----

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def compile(code: String, fnName: String): Either[String, AnyRef] = {
    val key = sha(code + "#" + fnName)
    compileCache.get(key) match {
      case Some(fn) => Right(fn)
      case None =>
        try {
          val fn = toolbox.eval(toolbox.parse(s"$code\n$fnName _"))
            .asInstanceOf[AnyRef]
          compileCache.put(key, fn)
          Right(fn)
        } catch {
          case e: Throwable =>
            Left(s"Invalid function code: ${e.getMessage}")
        }
    }
  }

  private def sqlType(scalaType: String): DataType = scalaType match {
    case "Int" | "Integer" => IntegerType
    case "Long" => LongType
    case "Double" | "Float" => DoubleType
    case "Boolean" => BooleanType
    case _ => StringType // default VARCHAR, matching src/app.py:734
  }

  private def conv(scalaType: String)(x: Any): Any = x match {
    case null => null
    case v => scalaType match {
      case "Int" | "Integer" => v match {
        case i: Int => i
        case l: Long => l.toInt
        case n: Number => n.intValue()
        case s: String => s.toInt
      }
      case "Long" => v match {
        case l: Long => l
        case n: Number => n.longValue()
        case s: String => s.toLong
      }
      case "Double" | "Float" => v match {
        case d: Double => d
        case n: Number => n.doubleValue()
        case s: String => s.toDouble
      }
      case "Boolean" => v match {
        case b: Boolean => b
        case s: String => s.toBoolean
      }
      case _ => v match {
        case s: String => s
        case other => other.toString
      }
    }
  }

  /** Null-in/null-out applies to reference-type (string-ish) params —
    * primitives can't be null in a JVM function anyway.
    */
  private def registerWithSpark(qname: String, fn: AnyRef,
      paramTypes: Seq[String], retType: String): Unit = {
    val ret = sqlType(retType)
    paramTypes.size match {
      case 1 =>
        val f = fn.asInstanceOf[Any => Any]
        val c0 = conv(paramTypes.head) _
        spark.udf.register(qname, new UDF1[Any, Any] {
          override def call(a: Any): Any =
            if (a == null) null else f(c0(a))
        }, ret)
      case 2 =>
        val f = fn.asInstanceOf[(Any, Any) => Any]
        val c0 = conv(paramTypes(0)) _; val c1 = conv(paramTypes(1)) _
        spark.udf.register(qname, new UDF2[Any, Any, Any] {
          override def call(a: Any, b: Any): Any =
            if (a == null && b == null) null else f(c0(a), c1(b))
        }, ret)
      case 3 =>
        val f = fn.asInstanceOf[(Any, Any, Any) => Any]
        val c0 = conv(paramTypes(0)) _; val c1 = conv(paramTypes(1)) _
        val c2 = conv(paramTypes(2)) _
        spark.udf.register(qname, new UDF3[Any, Any, Any, Any] {
          override def call(a: Any, b: Any, c: Any): Any =
            if (a == null && b == null && c == null) null
            else f(c0(a), c1(b), c2(c))
        }, ret)
      case n => throw new IllegalArgumentException(
        s"UDFs of arity $n are not supported (1-3)")
    }
  }
}
