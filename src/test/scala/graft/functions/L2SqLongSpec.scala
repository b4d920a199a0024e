package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** L2SqLong — the compiled exact-BIGINT squared-L2 kernel that replaced
  * the interpreted `aggregate(zip_with(...))` distance in the exact
  * ANN / k-means lanes (r13 optimization). Property: bit-identical to
  * the higher-order formulation it replaced, on random vectors in the
  * quantized-micros range, on mismatched-length arrays (zip_with pads
  * the shorter side with NULL, nulling the sum — since r14 the kernel
  * agrees there too, though the lanes only ever pass equal lengths),
  * and on NULL elements.
  */
class L2SqLongSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hof =
    """aggregate(zip_with(a, b, (p, q) -> (p - q) * (p - q)),
      |          CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin

  test("vec_l2sq_long equals the HOF formulation on 300 random 64-dim pairs") {
    val rnd = new Random(7)
    val rows = (0 until 300).map { i =>
      val a = Array.fill(64)((rnd.nextDouble() * 4e6 - 2e6).toLong)
      val b = Array.fill(64)((rnd.nextDouble() * 4e6 - 2e6).toLong)
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
      .select(col("i"),
        VariantFunctions.vec_l2sq_long(col("a"), col("b")).as("k"),
        expr(hof).as("h"))
    val bad = df.filter(col("k") =!= col("h") ||
      col("k").isNull =!= col("h").isNull).count()
    assert(bad === 0)
    // and against a plain Scala fold, independent of Spark entirely
    val got = df.select(col("i"), col("k")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, a, b) =>
      val want = a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
      assert(got(i) === want, s"case $i")
    }
  }

  test("vec_l2sq_long NULL semantics match zip_with + aggregate") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L), array(1L, NULL)),
        |  (array(CAST(NULL AS BIGINT)), array(3L)),
        |  (array(5L), array(7L))
        |AS t(a, b)""".stripMargin)
      .select(
        VariantFunctions.vec_l2sq_long(col("a"), col("b")).as("k"),
        expr(hof).as("h"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
    // null input arrays: both sides NULL
    val nr = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS a, array(1L) AS b")
      .select(VariantFunctions.vec_l2sq_long(col("a"), col("b")).as("k"))
      .collect()
    assert(nr.head.isNullAt(0))
  }

  test("vec_l2sq_long on mismatched lengths is NULL, matching zip_with padding") {
    // zip_with pads the shorter side with NULL -> NULL element ->
    // aggregate sum NULL; the kernel must agree (r13 VERDICT item 3)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L, 3L), array(1L, 2L)),
        |  (array(1L), array(1L, 2L, 3L, 4L)),
        |  (array(1L, 2L), array(1L, 2L))
        |AS t(a, b)""".stripMargin)
      .select(
        VariantFunctions.vec_l2sq_long(col("a"), col("b")).as("k"),
        expr(hof).as("h"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }
}
