package graft.variant

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** Test helper: canonical compact JSON with recursively key-sorted
  * objects — the form our printer emits (object fields are stored in
  * metadata-dictionary order, which is sorted UTF-8 key order).
  */
object TestJson {
  private val mapper = new ObjectMapper()

  def sortKeys(node: JsonNode): JsonNode = {
    val nf = JsonNodeFactory.instance
    if (node.isObject) {
      val sorted = nf.objectNode()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      node.fieldNames().forEachRemaining(n => names += n)
      implicit val utf8Order: Ordering[String] = (a: String, b: String) =>
        VariantMetadata.compareUtf8(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      names.sorted.foreach(n => sorted.set[JsonNode](n, sortKeys(node.get(n))))
      sorted
    } else if (node.isArray) {
      val arr = nf.arrayNode()
      node.elements().forEachRemaining(e => arr.add(sortKeys(e)))
      arr
    } else node
  }

  def canonical(json: String): String =
    mapper.writeValueAsString(sortKeys(mapper.readTree(json)))

  def canonical(node: JsonNode): String =
    mapper.writeValueAsString(sortKeys(node))
}
