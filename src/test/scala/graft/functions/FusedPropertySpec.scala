package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin: for arbitrary JSON trees, the FUSED single-pass
  * extraction ([[JsonPathExtract]], [[JsonKeys]], [[JsonSize]]) equals
  * the unfused parse → encode → decode pipeline for every target the
  * fusion rule admits. Direct interpreted eval — no SparkSession — so
  * hundreds of samples run in milliseconds.
  */
class FusedPropertySpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  private val genScalar: Gen[com.fasterxml.jackson.databind.JsonNode] = Gen.oneOf(
    Gen.const(nf.nullNode: com.fasterxml.jackson.databind.JsonNode),
    Gen.oneOf(true, false).map(nf.booleanNode(_): com.fasterxml.jackson.databind.JsonNode),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(nf.numberNode(_): com.fasterxml.jackson.databind.JsonNode),
    Gen.chooseNum(-1e12, 1e12).map(nf.numberNode(_): com.fasterxml.jackson.databind.JsonNode),
    Gen.alphaNumStr.map(nf.textNode(_): com.fasterxml.jackson.databind.JsonNode),
    Gen.identifier.map(s => nf.textNode(s * 10): com.fasterxml.jackson.databind.JsonNode))

  private def genNode(depth: Int): Gen[com.fasterxml.jackson.databind.JsonNode] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      4 -> genScalar,
      2 -> Gen.chooseNum(0, 5).flatMap(n =>
        Gen.listOfN(n, genNode(depth - 1)).map { els =>
          val a: ArrayNode = nf.arrayNode()
          els.foreach(a.add)
          a: com.fasterxml.jackson.databind.JsonNode
        }),
      2 -> Gen.chooseNum(0, 5).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.identifier, genNode(depth - 1))).map { kvs =>
          val o: ObjectNode = nf.objectNode()
          kvs.foreach { case (k, v) => o.set[com.fasterxml.jackson.databind.JsonNode](k, v) }
          o: com.fasterxml.jackson.databind.JsonNode
        }))

  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
    }
  }

  private def unfused(json: String, path: String, t: DataType): Any =
    VariantGet(VariantFromJson(Literal(json)), path, t, failOnError = false).eval(null)

  private def fused(json: String, path: String, t: DataType): Any =
    JsonPathExtract(Literal(json), path, t,
      parseFailOnError = true, castFailOnError = false).eval(null)

  test("fused extraction equals unfused for every admissible target over random trees") {
    val targets = Seq(StringType, LongType, DoubleType, BooleanType,
      IntegerType, DecimalType(38, 6))
    forAllSamples(genNode(3)) { node =>
      val json = s"""{"x": ${mapper.writeValueAsString(node)}}"""
      targets.foreach { t =>
        val u = unfused(json, "$.x", t)
        val f = fused(json, "$.x", t)
        assert(u == f, s"target ${t.simpleString} json=$json unfused=$u fused=$f")
      }
      // nested path into objects/arrays too
      val deep = s"""{"a": [{"b": ${mapper.writeValueAsString(node)}}]}"""
      val u = unfused(deep, "$.a[0].b", StringType)
      val f = fused(deep, "$.a[0].b", StringType)
      assert(u == f, s"deep json=$deep unfused=$u fused=$f")
    }
  }

  test("fused keys/size equal unfused over random trees") {
    forAllSamples(genNode(3)) { node =>
      val json = mapper.writeValueAsString(node)
      val uK = VariantKeys(VariantFromJson(Literal(json))).eval(null)
      val fK = JsonKeys(Literal(json), parseFailOnError = true).eval(null)
      assert(uK == fK || (uK != null && fK != null &&
        uK.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].array.toSeq ==
          fK.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].array.toSeq),
        s"keys json=$json unfused=$uK fused=$fK")
      val uS = VariantSize(VariantFromJson(Literal(json))).eval(null)
      val fS = JsonSize(Literal(json), parseFailOnError = true).eval(null)
      assert(uS == fS, s"size json=$json unfused=$uS fused=$fS")
      val uT = VariantTypeOf(VariantFromJson(Literal(json))).eval(null)
      val fT = JsonTypeOf(Literal(json), parseFailOnError = true).eval(null)
      assert(uT == fT, s"typeof json=$json unfused=$uT fused=$fT")
    }
  }
}
