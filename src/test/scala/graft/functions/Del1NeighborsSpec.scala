package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Del1Neighbors — the compiled twin of d_fuzzy_join's deletion-
  * neighborhood HOF (r14 optimization). Property: bit-identical
  * (elements AND order — array_distinct keeps first occurrence) to
  * `array_distinct(transform(sequence(0, length(p)), i ->
  *    IF(i = 0, p, concat(substring(p, 1, i - 1), substring(p, i + 1)))))`
  * on random strings with repeats (duplicate-collapse), multi-byte and
  * astral codepoints, and the empty string.
  */
class Del1NeighborsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hof =
    """array_distinct(transform(sequence(0, length(p)),
      |  i -> IF(i = 0, p,
      |          concat(substring(p, 1, i - 1), substring(p, i + 1)))))""".stripMargin

  test("del1_neighbors equals the HOF, elements and order") {
    val rnd = new Random(47)
    val alphabets = Seq("ab", "abc", "abcdefgh", "aé中𝄞")
    val rows = (0 until 300).map { i =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val cps = alpha.codePoints().toArray
      val n = rnd.nextInt(17)
      val sb = new java.lang.StringBuilder()
      (0 until n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      (i, sb.toString)
    } :+ ((1000, "")) :+ ((1001, "aaaa")) :+ ((1002, "𝄞𝄞"))
    val df = rows.toDF("i", "p")
      .select(col("i"),
        VariantFunctions.del1_neighbors(col("p")).as("k"),
        expr(hof).as("h"))
    assert(df.filter(not(col("k") <=> col("h"))).count() === 0)
    // null input -> null, like the HOF's sequence(0, length(NULL))
    val nr = spark.sql("SELECT CAST(NULL AS STRING) AS p")
      .select(VariantFunctions.del1_neighbors(col("p")).as("k")).collect()
    assert(nr.head.isNullAt(0))
  }
}
