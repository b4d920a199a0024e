package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Two-pass exact quantiles: differential against the definition (value
  * at 1-indexed rank max(1, ceil(q*n)) of the sorted multiset) across
  * distributions chosen to stress the histogram — uniform, power-law
  * skew (most buckets empty, one overfull), heavy duplicates, tiny
  * inputs, and the degenerate single-value column.
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val QS = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)

  private def model(values: Seq[Long], q: Double): Long = {
    val sorted = values.sorted
    val rank = math.max(1L, math.ceil(q * sorted.length).toLong)
    sorted((rank - 1).toInt)
  }

  private def check(values: Seq[Long], buckets: Int = 64): Unit = {
    val df = values.toDF("value").repartition(5)
    val got = Quantiles.exactQuantiles(df, "value", QS, buckets)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    QS.foreach { q =>
      assert(got(q) === model(values, q), s"q=$q over n=${values.length}")
    }
  }

  test("uniform random longs") {
    val rnd = new scala.util.Random(20260813L)
    check(Seq.fill(5000)(rnd.nextLong() % 1000000L))
  }

  test("power-law skew: one bucket holds most of the data") {
    val rnd = new scala.util.Random(1L)
    // 90% of values in [0, 10), outliers spread to 10^9
    check(Seq.fill(4000)(
      if (rnd.nextInt(10) == 0) rnd.nextLong().abs % 1000000000L
      else rnd.nextInt(10).toLong))
  }

  test("heavy duplicates across bucket boundaries") {
    check(Seq.fill(3000)(42L) ++ Seq.fill(3000)(43L) ++ Seq(1L, 100000L))
  }

  test("tiny inputs: fewer rows than buckets") {
    check(Seq(5L, 1L, 9L, 3L))
    check(Seq(7L))
  }

  test("degenerate: every value identical") {
    check(Seq.fill(100)(77L))
  }

  test("negative values") {
    val rnd = new scala.util.Random(9L)
    check(Seq.fill(2000)(rnd.nextLong() % 1000L)) // mixed sign
  }

  test("empty input yields empty result") {
    val df = Seq.empty[Long].toDF("value")
    assert(Quantiles.exactQuantiles(df, "value", QS).count() === 0)
  }
}
