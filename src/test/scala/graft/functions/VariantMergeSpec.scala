package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** RFC 7386 semantics of `variant_merge_patch` (VariantMerge.scala),
  * pinned case by case against the RFC's own example table, plus the
  * canonical-bytes guarantee: merging then printing equals parsing the
  * expected JSON directly.
  */
class VariantMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mergeJson(target: String, patch: String): String =
    spark.sql(
      s"""SELECT variant_to_json(variant_merge_patch(
         |  variant_from_json('${target.replace("'", "''")}'),
         |  variant_from_json('${patch.replace("'", "''")}'))) AS j""".stripMargin)
      .head.getString(0)

  test("RFC 7386 example table") {
    assert(mergeJson("""{"a":"b"}""", """{"a":"c"}""") === """{"a":"c"}""")
    assert(mergeJson("""{"a":"b"}""", """{"b":"c"}""") === """{"a":"b","b":"c"}""")
    assert(mergeJson("""{"a":"b"}""", """{"a":null}""") === """{}""")
    assert(mergeJson("""{"a":"b","b":"c"}""", """{"a":null}""") === """{"b":"c"}""")
    assert(mergeJson("""{"a":["b"]}""", """{"a":"c"}""") === """{"a":"c"}""")
    assert(mergeJson("""{"a":"c"}""", """{"a":["b"]}""") === """{"a":["b"]}""")
    assert(mergeJson("""{"a":{"b":"c"}}""", """{"a":{"b":"d","c":null}}""")
      === """{"a":{"b":"d"}}""")
    assert(mergeJson("""{"a":[{"b":"c"}]}""", """{"a":[1]}""") === """{"a":[1]}""")
    assert(mergeJson("""["a","b"]""", """["c","d"]""") === """["c","d"]""")
    assert(mergeJson("""{"a":"b"}""", """["c"]""") === """["c"]""")
    // our convention maps a top-level JSON null to SQL NULL (DevSmoke
    // "topnull"); a SQL-NULL patch therefore nulls the whole result —
    // the same observable outcome as the RFC's "replace with null"
    assert(mergeJson("""{"a":"foo"}""", "null") === null)
    assert(mergeJson("""{"a":"foo"}""", "\"bar\"") === "\"bar\"")
    // target nulls are VALUES (kept); only PATCH nulls delete — note our
    // canonical printer emits keys sorted
    assert(mergeJson("""{"e":null}""", """{"a":1}""") === """{"a":1,"e":null}""")
    assert(mergeJson("[1,2]", """{"a":"b","c":null}""") === """{"a":"b"}""")
    assert(mergeJson("""{}""", """{"a":{"bb":{"ccc":null}}}""") === """{"a":{"bb":{}}}""")
  }

  test("merged bytes are canonical: identical to parsing the expected JSON") {
    val r = spark.sql(
      """SELECT variant_merge_patch(
        |         variant_from_json('{"z": 1, "m": {"a": 1, "drop": 2}, "arr": [1, 2]}'),
        |         variant_from_json('{"m": {"drop": null, "b": 3}, "new": true}')) AS merged,
        |       variant_from_json('{"arr":[1,2],"m":{"a":1,"b":3},"new":true,"z":1}') AS expected
        |""".stripMargin).head
    val m = r.getStruct(0)
    val e = r.getStruct(1)
    assert(java.util.Arrays.equals(m.getAs[Array[Byte]](0), e.getAs[Array[Byte]](0)),
      "metadata bytes differ")
    assert(java.util.Arrays.equals(m.getAs[Array[Byte]](1), e.getAs[Array[Byte]](1)),
      "value bytes differ")
  }

  test("scalar payload types survive the merge round trip") {
    val j = mergeJson(
      """{"keep": {"d": 1.5, "big": 12345678901234567890, "s": "x"}}""",
      """{"added": {"neg": -7, "dec": 0.25}}""")
    assert(j === """{"added":{"dec":0.25,"neg":-7},"keep":{"big":12345678901234567890,"d":1.5,"s":"x"}}""")
  }

  test("foreign (Spark-builtin) variant input merges byte-identically") {
    // route the target through Spark's builtin parse_json → our struct:
    // first-seen unsorted dictionary exercises the decode path
    val r = spark.sql(
      """SELECT variant_to_json(variant_merge_patch(
        |         from_spark_variant(parse_json('{"z": 1, "a": {"x": 9}}')),
        |         variant_from_json('{"a": {"x": null, "y": 2}}'))) AS j""".stripMargin)
      .head.getString(0)
    assert(r === """{"a":{"y":2},"z":1}""")
  }

  test("variant_strip_keys: removal, survivors, non-objects, foreign encodings") {
    def strip(v: String, keys: String): String =
      spark.sql(
        s"""SELECT variant_to_json(variant_strip_keys(
           |  variant_from_json('${v.replace("'", "''")}'), $keys)) AS j""".stripMargin)
        .head.getString(0)
    assert(strip("""{"a":1,"b":2,"c":3}""", "array('b')") === """{"a":1,"c":3}""")
    assert(strip("""{"a":1,"b":2}""", "array('missing')") === """{"a":1,"b":2}""")
    assert(strip("""{"a":1,"b":2}""", "array('a','b')") === "{}")
    // only TOP-LEVEL keys strip; nested same-named keys survive
    assert(strip("""{"a":{"b":1},"b":2}""", "array('b')") === """{"a":{"b":1}}""")
    // non-objects pass through unchanged (re-encoded canonically)
    assert(strip("""[1,2,3]""", "array('a')") === "[1,2,3]")
    assert(strip(""""s"""", "array('a')") === "\"s\"")
    // foreign encoding in, canonical bytes out
    val r = spark.sql(
      """SELECT variant_to_json(variant_strip_keys(
        |  from_spark_variant(parse_json('{"z":1,"a":2,"m":3}')), array('m'))) AS j"""
        .stripMargin).head.getString(0)
    assert(r === """{"a":2,"z":1}""")
  }
}
