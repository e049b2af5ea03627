package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-parity `json_extract(json, path)`: returns the extracted value
  * as JSON TEXT — string values stay QUOTED (`"x"`), objects/arrays
  * serialize compact, numbers/booleans/JSON-null print bare — matching
  * DuckDB's JSON-typed result rendered to text. This differs from
  * Spark's `get_json_object` (and DuckDB's `json_extract_string`), which
  * unquote top-level strings; both spellings are registered side by side
  * in [[graft.engine.SqlCompat]] so a query ported from the reference
  * keeps its comparison semantics (a DuckDB query comparing
  * `json_extract(p,'$.t') = '"x"'` would silently break under unquoted
  * semantics).
  *
  * Path subset: `$`, `$.name` chains, `[idx]` array steps (e.g.
  * `$.a.b[2].c`) — the forms the reference's analytics use
  * (frontend/src/pages/SqlQuery.tsx:38). Missing path → SQL NULL;
  * malformed JSON → SQL NULL (DuckDB raises; a processing error in the
  * transform path audits as an Error row either way).
  *
  * Evaluation is interpreted (CodegenFallback): this runs on the ad-hoc
  * and transform channels, never in a gate query's hot path.
  */
case class JsonExtractDuck(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_extract"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonExtractDuck =
    copy(left = newLeft, right = newRight)

  @transient private lazy val mapper = new ObjectMapper()

  override def nullSafeEval(json: Any, path: Any): Any =
    try {
      val root = mapper.readTree(json.toString)
      val node = navigate(root, path.toString)
      // JSON null → SQL NULL, matching DuckDB (verified against 1.0.0)
      if (node == null || node.isMissingNode || node.isNull) null
      else UTF8String.fromString(node.toString)
    } catch { case _: Exception => null }

  /** Walk `$.a.b[2].c`-style paths; null on any miss or syntax error. */
  private def navigate(root: JsonNode, path: String): JsonNode = {
    if (path.isEmpty || path.charAt(0) != '$') return null
    var node = root
    var i = 1
    while (i < path.length && node != null) {
      path.charAt(i) match {
        case '.' =>
          var j = i + 1
          while (j < path.length && path.charAt(j) != '.' &&
            path.charAt(j) != '[') j += 1
          if (j == i + 1) return null // empty field name
          node = node.get(path.substring(i + 1, j))
          i = j
        case '[' =>
          val close = path.indexOf(']', i)
          if (close < 0) return null
          val idx =
            try path.substring(i + 1, close).trim.toInt
            catch { case _: NumberFormatException => return null }
          node = node.get(idx)
          i = close + 1
        case _ => return null
      }
    }
    node
  }
}
