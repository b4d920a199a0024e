package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** BottomKLongs — the mergeable KMV bottom-k sketch build that replaced
  * q_kmv_overlap's `distinct + row_number() <= k` window (r14
  * optimization). Properties: the exploded aggregate result is
  * row-identical to the window formulation (same distinct k smallest
  * values, ascending), it dedups inside the buffer (so a preceding
  * distinct is redundant), nulls are skipped, and the result is
  * partition-count-invariant (the map-side-combining claim).
  */
class BottomKLongsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bottom_k_longs equals distinct + row_number window, incl. duplicates") {
    val rnd = new Random(17)
    // 6 groups, sizes straddling k on both sides, with duplicate values
    val rows = (0 until 4000).map { i =>
      val g = rnd.nextInt(6)
      val v = (rnd.nextInt(if (g % 2 == 0) 40 else 100000)).toLong
      (g, v)
    }
    val k = 32
    val df = rows.toDF("g", "v")
    val win = Window.partitionBy(col("g")).orderBy(col("v"))
    val expect = df.select(col("g"), col("v")).distinct()
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("g"), col("v"), col("rnk").cast("long").as("rnk"))
    val got = df.groupBy(col("g"))
      .agg(VariantFunctions.bottom_k_longs(col("v"), k).as("hs"))
      .select(col("g"), posexplode(col("hs")).as(Seq("p", "v")))
      .select(col("g"), col("v"), (col("p") + 1).cast("long").as("rnk"))
    assert(got.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(got).count() === 0)
    // partition-count invariance: 1 partition vs many
    val got1 = df.repartition(1).groupBy(col("g"))
      .agg(VariantFunctions.bottom_k_longs(col("v"), k).as("hs"))
      .select(col("g"), posexplode(col("hs")).as(Seq("p", "v")))
      .select(col("g"), col("v"), (col("p") + 1).cast("long").as("rnk"))
    assert(got1.exceptAll(got).count() === 0)
    assert(got.exceptAll(got1).count() === 0)
  }

  test("bottom_k_longs skips nulls and handles tiny/empty groups") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('a', 5L), ('a', CAST(NULL AS BIGINT)), ('a', 3L), ('a', 5L),
        |  ('b', 9L)
        |AS t(g, v)""".stripMargin)
    val got = df.groupBy(col("g"))
      .agg(VariantFunctions.bottom_k_longs(col("v"), 4).as("hs"))
      .orderBy(col("g"))
      .collect()
    assert(got(0).getSeq[Long](1) === Seq(3L, 5L))
    assert(got(1).getSeq[Long](1) === Seq(9L))
  }
}
