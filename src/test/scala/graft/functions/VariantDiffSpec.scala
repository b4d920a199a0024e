package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential fuzz + example table for `variant_diff`: our
  * variant-tree diff vs an INDEPENDENT model on Jackson trees (same
  * house pattern as VariantMergeFuzzSpec — the implementations share no
  * code, so they only agree if the RFC-minimal-patch semantics, the
  * decode, and the canonical re-encode are all right), plus the
  * defining roundtrip `merge_patch(a, diff(a, b)) ≡ b` checked exactly
  * on null-free documents.
  */
class VariantDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.{NullNode, ObjectNode}
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** RFC 7386 merge on Jackson trees (reference model, as in
    * VariantMergeFuzzSpec). */
  private def modelMerge(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch.deepCopy[JsonNode]()
    else {
      val out = (if (target.isObject) target.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
                 else mapper.createObjectNode())
      val it = patch.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) out.remove(e.getKey)
        else out.set[JsonNode](e.getKey, modelMerge(
          Option(out.get(e.getKey)).getOrElse(NullNode.getInstance()), e.getValue))
      }
      out
    }

  /** Minimal-patch diff on Jackson trees — independent of
    * VariantMergePatch.diff. Jackson's value-based equals supplies the
    * structural comparison (order-insensitive for objects). */
  private def modelDiff(a: JsonNode, b: JsonNode): JsonNode =
    if (a.isObject && b.isObject) {
      val out = mapper.createObjectNode()
      val it = b.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) {
          // explicit null in b: unreachable as a value — delete if a has
          // the key (roundtrip target strips the field), else no-op
          if (a.has(e.getKey)) out.set[JsonNode](e.getKey, NullNode.getInstance())
        } else {
          val av = a.get(e.getKey)
          if (av == null) out.set[JsonNode](e.getKey, e.getValue)
          else if (av != e.getValue) {
            if (av.isObject && e.getValue.isObject) {
              val sub = modelDiff(av, e.getValue)
              if (sub.size() > 0) out.set[JsonNode](e.getKey, sub)
            } else out.set[JsonNode](e.getKey, e.getValue)
          }
        }
      }
      val ai = a.fieldNames()
      while (ai.hasNext) {
        val k = ai.next()
        if (!b.has(k)) out.set[JsonNode](k, NullNode.getInstance())
      }
      out
    } else b

  /** Canonical text of a Jackson tree: keys sorted, compact — matches
    * our printer for the generator's value space. */
  private def canonical(n: JsonNode): String =
    if (n.isObject) {
      import scala.jdk.CollectionConverters._
      n.asInstanceOf[ObjectNode].fields().asScala.toSeq
        .sortBy(_.getKey)
        .map(e => "\"" + e.getKey + "\":" + canonical(e.getValue))
        .mkString("{", ",", "}")
    } else if (n.isArray) {
      (0 until n.size()).map(i => canonical(n.get(i))).mkString("[", ",", "]")
    } else n.toString

  /** The documented roundtrip target: null-valued object fields
    * recursively removed; arrays untouched (they merge wholesale). */
  private def stripNulls(n: JsonNode): JsonNode =
    if (n.isObject) {
      val out = mapper.createObjectNode()
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        if (!e.getValue.isNull) out.set[JsonNode](e.getKey, stripNulls(e.getValue))
      }
      out
    } else n

  private def gen(rnd: scala.util.Random, depth: Int): String = {
    val keys = Seq("a", "b", "c", "d", "e")
    rnd.nextInt(if (depth >= 3) 4 else 6) match {
      case 0 => rnd.nextInt(200).toString
      case 1 => "\"s" + rnd.nextInt(10) + "\""
      case 2 => if (rnd.nextBoolean()) "true" else "false"
      case 3 => "null"
      case 4 =>
        (0 until rnd.nextInt(3)).map(_ => gen(rnd, depth + 1)).mkString("[", ",", "]")
      case _ =>
        rnd.shuffle(keys).take(rnd.nextInt(4))
          .map(k => "\"" + k + "\":" + gen(rnd, depth + 1)).mkString("{", ",", "}")
    }
  }

  test("example table: additions, deletions, nested, type change, non-objects") {
    val cases = Seq(
      ("""{"a": 1, "b": 2}""", """{"a": 1}""", """{"b":null}"""),
      ("""{"a": 1}""", """{"a": 2, "c": 3}""", """{"a":2,"c":3}"""),
      ("""{"a": {"x": 1, "y": 2}}""", """{"a": {"x": 1}}""", """{"a":{"y":null}}"""),
      ("""{"a": {"x": 1}}""", """{"a": {"x": 1}}""", """{}"""),
      ("""{"a": 1}""", """5""", """5"""),
      ("""5""", """{"a": 1}""", """{"a":1}"""),
      ("""{"a": [1, 2]}""", """{"a": [1, 2, 3]}""", """{"a":[1,2,3]}"""),
      ("""{"a": [1, 2]}""", """{"a": [1, 2]}""", """{}"""),
      ("""{"a": 1}""", """{"a": 1, "b": null}""", """{}"""), // null in b, absent in a: no-op
      ("""{"a": 1, "b": 2}""", """{"a": 1, "b": null}""", """{"b":null}"""), // null in b, present in a: delete
      ("""{"a": {"x": 1, "y": 3}}""", """{"a": {"x": 1, "y": null}}""", """{"a":{"y":null}}"""), // nested null-strip
      ("""{"a": 1}""", """{"a": 1.0}""", """{"a":1.0}""")    // type change replaces
    )
    import spark.implicits._
    val got = cases.zipWithIndex.map { case ((a, b, _), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .selectExpr("i",
        "variant_to_json(variant_diff(variant_from_json(a), variant_from_json(b))) AS dj")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((a, b, want), i) =>
      assert(got(i) === want, s"diff($a, $b)")
    }
  }

  test("300 random pairs: diff agrees with the Jackson model; roundtrip holds") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    def root(): String = {
      val s = gen(rnd, if (rnd.nextInt(4) == 0) 1 else 0)
      if (s == "null") "0" else s // top-level null is SQL NULL, not a doc
    }
    val pairs = (1 to 300).map { i =>
      // bias toward objects sharing keys (where diff semantics live)
      val a = if (rnd.nextInt(5) == 0) root()
        else "{" + Seq("a", "b", "c").map(k => "\"" + k + "\":" + gen(rnd, 1)).mkString(",") + "}"
      val b = if (rnd.nextInt(5) == 0) root()
        else "{" + rnd.shuffle(Seq("a", "b", "c", "d")).take(rnd.nextInt(4) + 1)
          .map(k => "\"" + k + "\":" + gen(rnd, 1)).mkString(",") + "}"
      (i, a, b)
    }
    val got = pairs.toDF("i", "a", "b")
      .selectExpr("i",
        "variant_to_json(variant_diff(variant_from_json(a), variant_from_json(b))) AS dj",
        "variant_to_json(variant_merge_patch(variant_from_json(a), " +
          "variant_diff(variant_from_json(a), variant_from_json(b)))) AS rt")
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    pairs.foreach { case (i, a, b) =>
      val an = mapper.readTree(a)
      val bn = mapper.readTree(b)
      val wantDiff = canonical(modelDiff(an, bn))
      val (gotDiff, gotRt) = got(i)
      assert(gotDiff === wantDiff, s"diff($a, $b)")
      // roundtrip through the independent merge model
      assert(gotRt === canonical(modelMerge(an, modelDiff(an, bn))),
        s"roundtrip($a, $b)")
      // and exactly the documented target: b with null-valued object
      // fields recursively stripped (stopping at arrays, which merge
      // wholesale) — for null-free b this reduces to b itself
      assert(gotRt === canonical(stripNulls(bn)), s"stripped roundtrip($a, $b)")
    }
  }

  test("diff of SQL NULL inputs is NULL (both directions)") {
    val r = spark.sql(
      """SELECT variant_diff(variant_from_json('null'), variant_from_json('{"a":1}')) IS NULL AS l,
        |       variant_diff(variant_from_json('{"a":1}'), variant_from_json('null')) IS NULL AS r
        |""".stripMargin).head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }
}
