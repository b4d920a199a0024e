package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** VecQuantizePpm / VecSubLong — the compiled twins of the remaining
  * interpreted vector HOFs (r14 optimization): the ppmVecs micros
  * quantization `transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)
  * * 1000000.0 + 0.5) AS BIGINT))` and the IVF-PQ residual
  * `zip_with(e, c, (a, b) -> a - b)`. Property: bit-identical to the
  * HOF forms, including NULL elements and (for sub) mismatched lengths.
  */
class VecKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qHof =
    "transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"

  test("vec_quantize_ppm equals the transform HOF on random float vectors") {
    val rnd = new Random(23)
    val rows = (0 until 300).map { i =>
      (i, Array.fill(64)((rnd.nextDouble() * 4.0 - 2.0).toFloat))
    }
    val df = rows.toDF("i", "v")
      .select(col("i"),
        VariantFunctions.vec_quantize_ppm(col("v")).as("k"),
        expr(qHof).as("h"))
    assert(df.filter(not(col("k") <=> col("h"))).count() === 0)
    // negative / boundary values straddling the rounding cut
    val edge = Seq(Array(-1.5f, -0.4999995f, 0.4999995f, 1.5f, 0f, -0f))
      .map(Tuple1(_)).toDF("v")
      .select(VariantFunctions.vec_quantize_ppm(col("v")).as("k"), expr(qHof).as("h"))
    assert(edge.filter(not(col("k") <=> col("h"))).count() === 0)
  }

  test("vec_quantize_ppm NULL semantics match the HOF") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(1.25 AS FLOAT), CAST(NULL AS FLOAT))),
        |  (CAST(NULL AS ARRAY<FLOAT>)),
        |  (array(CAST(-0.5 AS FLOAT)))
        |AS t(v)""".stripMargin)
      .select(VariantFunctions.vec_quantize_ppm(col("v")).as("k"), expr(qHof).as("h"))
    assert(df.filter(not(col("k") <=> col("h"))).count() === 0)
  }

  test("vec_sub_long equals zip_with incl. NULLs and mismatched lengths") {
    val subHof = "zip_with(a, b, (x, y) -> x - y)"
    val rnd = new Random(31)
    val rows = (0 until 200).map { i =>
      (i, Array.fill(64)((rnd.nextDouble() * 4e6 - 2e6).toLong),
        Array.fill(64)((rnd.nextDouble() * 4e6 - 2e6).toLong))
    }
    val df = rows.toDF("i", "a", "b")
      .select(VariantFunctions.vec_sub_long(col("a"), col("b")).as("k"),
        expr(subHof).as("h"))
    assert(df.filter(not(col("k") <=> col("h"))).count() === 0)
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L, 3L), array(10L)),
        |  (array(1L), array(10L, 20L, 30L)),
        |  (array(1L, NULL), array(10L, 20L)),
        |  (CAST(NULL AS ARRAY<BIGINT>), array(1L))
        |AS t(a, b)""".stripMargin)
      .select(VariantFunctions.vec_sub_long(col("a"), col("b")).as("k"),
        expr(subHof).as("h"))
    assert(edge.filter(not(col("k") <=> col("h"))).count() === 0)
  }
}
