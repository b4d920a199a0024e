package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{VariantFunctions => vf}

/** Count-min sketch properties (CountMin.scala): the structural
  * guarantees q_countmin's driver-lane gate relies on.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DEPTH = 4
  private val WIDTH = 256

  /** Zipf-ish multiset: key k appears 1 + (k % 17) times. */
  private def keys: Seq[Long] =
    (1L to 500L).flatMap(k => Seq.fill(1 + (k % 17).toInt)(k))

  test("never undercounts: est >= exact for every key (long + string)") {
    val exact = keys.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val sk = keys.toDF("k").agg(vf.count_min_agg($"k", DEPTH, WIDTH))
      .head.getAs[Array[Byte]](0)
    val under = exact.count { case (k, n) =>
      spark.range(1).select(vf.count_min_query(lit(sk), lit(k))).head.getLong(0) < n
    }
    assert(under === 0)

    val sSk = keys.map(k => s"key-$k").toDF("k")
      .agg(vf.count_min_agg($"k", DEPTH, WIDTH)).head.getAs[Array[Byte]](0)
    val sEst = spark.range(1)
      .select(vf.count_min_query(lit(sSk), lit("key-17"))).head.getLong(0)
    assert(sEst >= exact(17L))
  }

  test("error bound: est <= exact + ceil(e*N/width) for all keys") {
    val n = keys.size.toLong
    val slack = math.ceil(math.E * n / WIDTH).toLong
    val sk = keys.toDF("k").agg(vf.count_min_agg($"k", DEPTH, WIDTH).as("sk"))
    val exact = keys.toDF("k").groupBy($"k").agg(count(lit(1)).as("n_exact"))
    val over = exact.crossJoin(broadcast(sk))
      .filter(vf.count_min_query($"sk", $"k") > $"n_exact" + lit(slack))
      .count()
    assert(over === 0L)
  }

  test("merge ≡ single-partition build: sketch independent of partitioning") {
    val df = keys.toDF("k")
    val one = df.repartition(1).agg(vf.count_min_agg($"k", DEPTH, WIDTH))
      .head.getAs[Array[Byte]](0)
    val many = df.repartition(13).agg(vf.count_min_agg($"k", DEPTH, WIDTH))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("total mass: each depth row sums to N") {
    val sk = keys.toDF("k").agg(vf.count_min_agg($"k", DEPTH, WIDTH))
      .head.getAs[Array[Byte]](0)
    val (d, w, grid) = CountMinUtil.fromBytes(sk)
    assert(d === DEPTH && w === WIDTH)
    (0 until d).foreach { r =>
      assert(grid.slice(r * w, (r + 1) * w).sum === keys.size.toLong)
    }
  }

  test("SQL surface: count_min_agg / count_min_query registered") {
    graft.Tables.orders(spark, TestSpark.SF).createOrReplaceTempView("cm_orders")
    val est = spark.sql(
      """SELECT count_min_query(sk, CAST(7 AS BIGINT)) FROM
        |  (SELECT count_min_agg(o_custkey, 4, 256) AS sk FROM cm_orders)""".stripMargin)
      .head.getLong(0)
    val exact = spark.sql("SELECT COUNT(*) FROM cm_orders WHERE o_custkey = 7")
      .head.getLong(0)
    assert(est >= exact)
  }

  test("malformed sketch bytes raise a clear error") {
    val e = intercept[Exception] {
      spark.range(1)
        .select(vf.count_min_query(lit(Array[Byte](1, 2, 3)), lit(1L))).head
    }
    assert(e.getMessage != null)
  }
}
