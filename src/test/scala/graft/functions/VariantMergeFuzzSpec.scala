package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential fuzz for `variant_merge_patch`: 300 seeded random
  * document pairs merged by our variant-tree implementation vs an
  * INDEPENDENT model built on Jackson JSON trees (no shared code with
  * VariantMerge) — the two only agree if the RFC semantics, the
  * decode, and the canonical re-encode are all right.
  */
class VariantMergeFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ObjectNode, NullNode}
  private val mapper = new ObjectMapper()

  /** RFC 7386 on Jackson trees — the reference model. */
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

  /** Canonical text of a Jackson tree: keys sorted, compact — matches
    * our printer's formatting for the value space the generator emits
    * (ints, booleans, strings, arrays, objects, nulls). */
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

  /** Random JSON value; keys drawn from a small pool so target/patch
    * collide often (collisions are where merge semantics live). */
  private def gen(rnd: scala.util.Random, depth: Int): String = {
    val keys = Seq("a", "b", "c", "d", "e")
    rnd.nextInt(if (depth >= 3) 4 else 6) match {
      case 0 => rnd.nextInt(200).toString
      case 1 => "\"s" + rnd.nextInt(10) + "\""
      case 2 => if (rnd.nextBoolean()) "true" else "false"
      case 3 => "null"
      case 4 => // array
        (0 until rnd.nextInt(3)).map(_ => gen(rnd, depth + 1)).mkString("[", ",", "]")
      case _ => // object
        rnd.shuffle(keys).take(rnd.nextInt(4))
          .map(k => "\"" + k + "\":" + gen(rnd, depth + 1)).mkString("{", ",", "}")
    }
  }

  test("300 random pairs agree with an independent Jackson model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    // targets/patches biased toward objects so recursion gets exercised
    val pairs = (1 to 300).map { i =>
      val t = "{" + Seq("a", "b", "c").map(k => "\"" + k + "\":" + gen(rnd, 1)).mkString(",") + "}"
      val p = "{" + rnd.shuffle(Seq("a", "b", "c", "d")).take(rnd.nextInt(4) + 1)
        .map(k => "\"" + k + "\":" + gen(rnd, 1)).mkString(",") + "}"
      (i, t, p)
    }
    val got = pairs.toDF("i", "t", "p")
      .selectExpr("i", "variant_to_json(variant_merge_patch(" +
        "variant_from_json(t), variant_from_json(p))) AS j")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    pairs.foreach { case (i, t, p) =>
      val expected = canonical(modelMerge(mapper.readTree(t), mapper.readTree(p)))
      assert(got(i) === expected, s"pair $i: target=$t patch=$p")
    }
  }
}
