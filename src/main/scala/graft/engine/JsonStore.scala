package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Tiny atomic JSON snapshot store for control-plane state (webhook
  * catalog, UDF sources, reference-table metadata). The durable form of
  * the reference's catalog tables (src/app.py:98-169) without dragging
  * in a database: state is small (thousands of rows), mutations are
  * serialized, and a write-temp-then-atomic-move snapshot per mutation
  * is both crash-safe and trivially inspectable.
  *
  * The DATA plane (audit events, reference-table contents) stays in
  * parquet — this is only for the driver-resident catalog maps.
  */
final class JsonStore(path: Path) {

  private val mapper = new ObjectMapper()

  def exists: Boolean = Files.exists(path)

  def save(rows: Seq[ObjectNode]): Unit = {
    val arr = mapper.createArrayNode()
    rows.foreach(arr.add)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.createDirectories(path.getParent)
    Files.writeString(tmp, mapper.writeValueAsString(arr))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def load(): Seq[ObjectNode] =
    if (!exists) Nil
    else {
      val arr = mapper.readTree(Files.readString(path)).asInstanceOf[ArrayNode]
      (0 until arr.size()).map(i => arr.get(i).asInstanceOf[ObjectNode])
    }

  def newNode(): ObjectNode = mapper.createObjectNode()
}

object JsonStore {
  def apply(dir: String, file: String): JsonStore =
    new JsonStore(Paths.get(dir, file))
}
