package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The generated Hilbert CTE chain (QualityQueries.hilbertSql) against
  * an independent Scala reference of the public-domain xy2d algorithm:
  * bijectivity over the full 256×256 grid and unit-step adjacency —
  * the locality property the layout exists for.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference xy2d, order 8 (n = 256). */
  private def xy2d(xIn: Int, yIn: Int): Int = {
    var (x, y, d) = (xIn, yIn, 0)
    var s = 128
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255 - x; y = 255 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("reference xy2d is a bijection with unit-step adjacency") {
    val ds = Array.ofDim[Int](65536)
    val seen = new java.util.BitSet(65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = xy2d(x, y)
      assert(d >= 0 && d < 65536)
      assert(!seen.get(d), s"collision at ($x,$y)")
      seen.set(d)
      ds(d) = (x << 8) | y
    }
    // consecutive d values are grid neighbors (|dx|+|dy| = 1)
    (1 until 65536).foreach { d =>
      val (x0, y0) = (ds(d - 1) >> 8, ds(d - 1) & 255)
      val (x1, y1) = (ds(d) >> 8, ds(d) & 255)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1, s"jump at d=$d")
    }
  }

  test("generated SQL chain matches the reference on a planted grid") {
    import spark.implicits._
    // cover all four quadrants + flip/swap corners
    val pts = Seq((0, 0), (255, 255), (255, 0), (0, 255), (1, 0), (0, 1),
      (127, 128), (128, 127), (200, 13), (13, 200), (97, 97))
    pts.map { case (x, y) => (x.toLong, y.toLong) }
      .toDF("o_custkey", "o_orderkey")
      .createOrReplaceTempView("orders_hilbert_test")
    val sql = QualityQueries.hilbertTestSql
      .replace("FROM orders", "FROM orders_hilbert_test")
    val got = spark.sql(sql)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x.toLong, y.toLong)) === xy2d(x, y).toLong, s"($x,$y)")
    }
  }
}
