package graft.functions

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.variant.{ParseJson, VariantGet => SparkVG}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential testing against Spark 4.1's built-in variant
  * implementation (SURVEY §1.6: the built-in is the differential oracle,
  * not our storage type). Where semantics coincide — everything except
  * the reference's top-level-null rule — extraction through our codec
  * must equal extraction through Spark's.
  */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builtinGet(jsonCol: String, path: String, dt: DataType) =
    Bridge.column(SparkVG(
      Bridge.expression(Bridge.column(ParseJson(Bridge.expression(col(jsonCol)), true))),
      Literal.create(path), dt, true, None))

  private def oursGet(jsonCol: String, path: String, dt: DataType) =
    VariantFunctions.variant_get(
      VariantFunctions.variant_from_json(col(jsonCol)), path, dt)

  test("events corpus: long/string extraction equals Spark built-in") {
    val ev = graft.Tables.events(spark, TestSpark.SF).select(col("props").as("j"))
    val diff = ev.select(
        oursGet("j", "$.k", LongType).as("ours"),
        builtinGet("j", "$.k", LongType).as("theirs"))
      .filter(!(col("ours") <=> col("theirs")))
      .count()
    assert(diff == 0)
  }

  test("escape sequences and exotic strings: extraction equals Spark built-in") {
    // JSON escapes (\n \t \" \\ \uXXXX, escaped surrogate pairs, NUL),
    // escaped characters inside KEYS, and deep unicode — Jackson decodes
    // them on both sides, but the value must survive OUR encode/decode
    // round trip identically to the builtin's.
    // \u escapes assembled by concatenation so Scala's lexer cannot
    // pre-process them; the JSON parser must see the escape itself
    val u = "\\" + "u"
    val docs = Seq(
      """{"k": "a\nb"}""",
      """{"k": "q\"uote"}""",
      """{"k": "tab\tx"}""",
      """{"k": "back\\slash"}""",
      """{"k": "\u00e9\u0436\u4e2d"}""",
      s"""{"k": "${u}00e9 escaped"}""",
      s"""{"k": "${u}d83d${u}de00"}""", // escaped surrogate pair
      s"""{"k": "raw emoji ${u}2764"}""",
      """{"k": ""}""").toDF("j")
    val diff = docs.select(
        oursGet("j", "$.k", StringType).as("ours"),
        builtinGet("j", "$.k", StringType).as("theirs"))
      .filter(!(col("ours") <=> col("theirs")))
      .count()
    assert(diff == 0)
    // escaped space inside a KEY, addressed with bracket path syntax
    val keyed = Seq("""{"k x": 7}""").toDF("j")
    val r = keyed.select(
        oursGet("j", "$['k x']", LongType).as("ours"),
        builtinGet("j", "$['k x']", LongType).as("theirs"))
      .collect()(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 7L, r.toString)
  }

  test("interop: Spark's builtin reader consumes OUR encoded bytes (writer spec compat)") {
    // our codec encodes, to_spark_variant passes the buffers verbatim,
    // and Spark's builtin variant_get + cast-to-string read them — if
    // our writer deviated from the Open Variant spec anywhere (widths,
    // headers, dictionaries, frames) this would diverge or throw
    val docs = Seq(
      """{"b": 1, "a": {"y": 2.5, "x": [1, "s", null, true]}, "c": -128}""",
      """{"big": 99999999999999999999999999, "neg": -3.75e2}""",
      """{"unicode": "héllo😀", "longstr": "%s"}""".format("x" * 200),
      """[1, [2, [3]], {"deep": {"deeper": 7}}]""",
      """{"n": null, "t": true, "f": false}""",
      """{"i8": 127, "i16": 32767, "i32": 2147483647, "i64": 9223372036854775807}""").toDF("j")
    val ours = VariantFunctions.variant_from_json(col("j"))
    val cases: Seq[(String, DataType)] = Seq(
      ("$.a.x[1]", StringType), ("$.a.y", DoubleType), ("$.c", LongType),
      ("$.i64", LongType), ("$.unicode", StringType), ("$.longstr", StringType),
      ("$.n", StringType), ("$.t", BooleanType), ("$[2].deep.deeper", LongType))
    for ((path, dt) <- cases) {
      val mine = VariantFunctions.variant_get(ours, path, dt)
      val theirs = Bridge.column(SparkVG(
        Bridge.expression(VariantFunctions.to_spark_variant(ours)),
        Literal.create(path), dt, false, None))
      val bad = docs.select(col("j"), mine.as("ours"), theirs.as("theirs"))
        .filter(!(col("ours") <=> col("theirs"))).collect()
      assert(bad.isEmpty, s"path $path as $dt: ${bad.take(2).mkString(";")}")
    }
  }

  test("interop: our reader consumes Spark's builtin-encoded bytes (reader spec compat)") {
    val docs = Seq(
      """{"b": 1, "a": {"y": 2.5, "x": [1, "s", null, true]}, "c": -128}""",
      """[10, "arr", {"k": 5}]""",
      """{"i64": 9223372036854775807, "d": 1.5}""").toDF("j")
    val sparkV = Bridge.column(ParseJson(Bridge.expression(col("j")), true))
    val backToOurs = VariantFunctions.from_spark_variant(sparkV)
    val cases: Seq[(String, DataType)] = Seq(
      ("$.a.x[3]", BooleanType), ("$.c", LongType), ("$.i64", LongType),
      ("$.d", DoubleType), ("$[1]", StringType), ("$[2].k", LongType))
    for ((path, dt) <- cases) {
      val viaOurs = VariantFunctions.variant_get(backToOurs, path, dt)
      val direct = Bridge.column(SparkVG(
        Bridge.expression(sparkV), Literal.create(path), dt, false, None))
      val bad = docs.select(col("j"), viaOurs.as("ours"), direct.as("theirs"))
        .filter(!(col("ours") <=> col("theirs"))).collect()
      assert(bad.isEmpty, s"path $path as $dt: ${bad.take(2).mkString(";")}")
    }
  }

  test("fuzz: our reader resolves every leaf of Spark-encoded variants (foreign dictionaries)") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode, ArrayNode}
    val mapper = new ObjectMapper()
    val nf = JsonNodeFactory.instance
    val genScalar: Gen[com.fasterxml.jackson.databind.JsonNode] = Gen.oneOf(
      Gen.oneOf(true, false).map(nf.booleanNode(_): com.fasterxml.jackson.databind.JsonNode),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(nf.numberNode(_): com.fasterxml.jackson.databind.JsonNode),
      Gen.alphaNumStr.map(nf.textNode(_): com.fasterxml.jackson.databind.JsonNode),
      // multi-byte strings exercise the charset path end to end
      Gen.identifier.map(s => nf.textNode(s + "é😀"): com.fasterxml.jackson.databind.JsonNode))
    def genNode(depth: Int): Gen[com.fasterxml.jackson.databind.JsonNode] =
      if (depth <= 0) genScalar
      else Gen.frequency(
        3 -> genScalar,
        2 -> Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, genNode(depth - 1)).map { els =>
          val a: ArrayNode = nf.arrayNode(); els.foreach(a.add); a: com.fasterxml.jackson.databind.JsonNode
        }),
        3 -> Gen.chooseNum(1, 5).flatMap(n =>
          Gen.listOfN(n, Gen.zip(Gen.identifier, genNode(depth - 1))).map { kvs =>
            val o: ObjectNode = nf.objectNode()
            kvs.foreach { case (k, v) => o.set[com.fasterxml.jackson.databind.JsonNode](k, v) }
            o: com.fasterxml.jackson.databind.JsonNode
          }))
    var seed = Seed(13L)
    val docs = (1 to 120).flatMap { _ =>
      val r = genNode(3).apply(Gen.Parameters.default, seed)
      seed = seed.next
      r.map(mapper.writeValueAsString)
    }
    // Spark's builtin writer: first-seen dictionaries, name-sorted frames
    val encoded = docs.toDF("j")
      .select(col("j"), VariantFunctions.from_spark_variant(
        Bridge.column(ParseJson(Bridge.expression(col("j")), true))).as("v"))
      .collect()
    encoded.foreach { row =>
      val json = row.getString(0)
      val v = row.getStruct(1)
      val meta = new graft.variant.MetadataView(v.getAs[Array[Byte]]("metadata"), 0)
      val root = new graft.variant.VariantView(v.getAs[Array[Byte]]("value"), 0)
      def walk(node: com.fasterxml.jackson.databind.JsonNode,
               view: graft.variant.VariantView): Unit = {
        assert(view != null, s"missing value in $json")
        if (node.isObject) {
          assert(view.isObject, json)
          val it = node.properties().iterator()
          while (it.hasNext) {
            val e = it.next()
            val id = meta.findKey(e.getKey)
            assert(id >= 0, s"key ${e.getKey} unresolved in $json")
            walk(e.getValue, view.getObject.getField(id))
          }
        } else if (node.isArray) {
          assert(view.isArray, json)
          (0 until node.size()).foreach(i => walk(node.get(i), view.getArray.elementAt(i)))
        } else if (node.isTextual) {
          assert(VariantExtract.asString(meta, view) == node.textValue(), json)
        } else if (node.isBoolean) {
          assert(view.getBoolean == node.booleanValue(), json)
        } else if (node.isIntegralNumber) {
          assert(VariantExtract.cast(meta, view, LongType, failOnError = true) ==
            node.longValue(), json)
        }
      }
      walk(mapper.readTree(json), root)
    }
  }

  test("fused keys/size equal Spark's json_object_keys / json_array_length") {
    // our variant_keys returns dictionary (sorted) order; Spark's
    // json_object_keys preserves input order — compare sorted
    val docs = Seq(
      """{"b": 1, "a": 2, "c": {"x": 1}}""",
      """{"only": [1, 2, 3]}""",
      """{}""",
      """[1, 2, {"q": 1}, null]""",
      """[]""",
      """"scalar"""").toDF("j")
    val diff = docs.select(
        sort_array(VariantFunctions.variant_keys(
          VariantFunctions.variant_from_json(col("j")))).as("ours_keys"),
        sort_array(json_object_keys(col("j"))).as("spark_keys"),
        VariantFunctions.variant_size(
          VariantFunctions.variant_from_json(col("j"))).cast("int").as("ours_size"),
        when(col("j").startsWith("["),
          json_array_length(col("j"))).as("spark_arr_len"))
      .collect()
    diff.foreach { r =>
      assert((r.isNullAt(0) && r.isNullAt(1)) ||
        r.getSeq[String](0) == r.getSeq[String](1), r.toString)
      if (!r.isNullAt(3)) assert(r.getInt(2) == r.getInt(3), r.toString)
    }
  }

  test("generated JSON corpus: typed extraction equals Spark built-in") {
    // Field types are fixed per path: JSON float formatting is a KNOWN
    // divergence (the reference maps floats to Float64, json.rs:26-33;
    // Spark's parse_json normalizes exact decimals, so '-1.0' renders
    // '-1' there) — numeric leaves compare as DOUBLE, string leaves as
    // STRING.
    val genLong: Gen[String] = Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString)
    val genStr: Gen[String] = Gen.alphaNumStr.map(s => "\"" + s + "\"")
    val genMixed: Gen[String] = Gen.oneOf(genStr, Gen.oneOf("true", "false", "null"))
    val genDoc: Gen[String] = for {
      a <- Gen.chooseNum(-1e9, 1e9)
      b <- genStr; c <- genMixed
      d0 <- genStr; d2 <- genLong
    } yield s"""{"a": $a, "b": {"c": $b}, "d": [$d0, null, $d2], "e": $c}"""

    var seed = Seed(7L)
    val docs = (1 to 120).flatMap { i =>
      val r = genDoc.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
    val df = docs.toDF("j")
    df.cache().count()
    val cases: Seq[(String, DataType)] = Seq(
      ("$.a", DoubleType),
      ("$.b.c", StringType), ("$.d[0]", StringType), ("$.d[2]", LongType),
      ("$.e", StringType), ("$.missing", StringType), ("$.d[9]", StringType))
    for ((path, dt) <- cases) {
      // try-mode on both sides: cast mismatches become NULL rather than
      // error, so every generated doc is comparable
      val ours = VariantFunctions.variant_get(
        VariantFunctions.try_variant_from_json(col("j")), path, dt)
      val theirs = Bridge.column(SparkVG(
        Bridge.expression(Bridge.column(ParseJson(Bridge.expression(col("j")), true))),
        Literal.create(path), dt, false, None))
      val mismatches = df.select(col("j"), ours.as("ours"), theirs.as("theirs"))
        .filter(!(col("ours") <=> col("theirs")))
        .collect()
      assert(mismatches.isEmpty,
        s"path $path as $dt: ${mismatches.take(3).mkString("; ")}")
    }
    df.unpersist()
  }
}
