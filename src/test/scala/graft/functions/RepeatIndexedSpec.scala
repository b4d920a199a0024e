package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** RepeatIndexed — the compiled twin of the weighted-minhash tf
  * expansion HOF (r13 optimization; d_wminhash_md5 is a 100×-curve
  * lane). Property: bit-identical to
  * `transform(sequence(CAST(0 AS BIGINT), tf - 1), j ->
  *    concat(g, '#', CAST(j AS STRING)))` for tf >= 1, including
  * multi-byte grams and multi-digit indices.
  */
class RepeatIndexedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repeat_indexed equals the sequence/concat HOF for tf >= 1") {
    val rnd = new Random(61)
    val rows = (0 until 200).map { i =>
      val g = if (rnd.nextInt(5) == 0) "héllo 中" + i else "gram " + rnd.nextInt(50)
      (i, g, 1L + rnd.nextInt(15))
    } :+ ((1000, "x", 12L))
    val df = rows.toDF("i", "g", "tf")
      .select(col("i"),
        VariantFunctions.repeat_indexed(col("g"), col("tf")).as("k"),
        expr("transform(sequence(CAST(0 AS BIGINT), tf - 1), " +
          "j -> concat(g, '#', CAST(j AS STRING)))").as("h"))
    val bad = df.filter(not(col("k") <=> col("h"))).count()
    assert(bad === 0)
  }

  test("repeat_indexed rejects tf above Int.MaxValue instead of wrapping") {
    // r13 ADVICE: tf.toInt would silently truncate; the kernel must
    // fail loudly (unreachable from the groupBy-count call site)
    val ex = intercept[Exception] {
      Seq(("g", Int.MaxValue.toLong + 1L)).toDF("g", "tf")
        .select(VariantFunctions.repeat_indexed(col("g"), col("tf")))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("repeat_indexed tf out of range")))
  }
}
