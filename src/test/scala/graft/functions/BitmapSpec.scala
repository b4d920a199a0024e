package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{VariantFunctions => vf}

/** Bitmap exact-distinct sketch properties (BitmapAgg.scala): the
  * guarantees q_bitmap_distinct / q_bitmap_rollup's driver gates rely
  * on — exactness vs COUNT(DISTINCT), partition-invariant merge, and
  * the two-level OR-merge algebra.
  */
class BitmapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Ids with duplicates, page-boundary stragglers (65535/65536), and a
    * far page (10M range) to exercise sparse + multi-page layout. */
  private def ids: Seq[Long] =
    (0L to 400L) ++ (0L to 400L by 2) ++ Seq(65535L, 65536L, 65537L) ++
      (10000000L to 10000050L by 5)

  test("cardinality matches COUNT(DISTINCT) exactly") {
    val df = ids.toDF("id")
    val got = df.agg(vf.bitmap_cardinality(vf.bitmap_agg($"id"))).head().getLong(0)
    val want = df.distinct().count()
    assert(got === want)
  }

  test("merge ≡ single-partition build: bytes independent of partitioning") {
    val df = ids.toDF("id")
    val one = df.repartition(1).agg(vf.bitmap_agg($"id")).head().getAs[Array[Byte]](0)
    val many = df.repartition(13).agg(vf.bitmap_agg($"id")).head().getAs[Array[Byte]](0)
    assert(BitmapUtil.cardinality(BitmapUtil.fromBytes(one)) ===
      BitmapUtil.cardinality(BitmapUtil.fromBytes(many)))
    // page sets and bits must agree exactly, not just the popcount
    val a = BitmapUtil.fromBytes(one)
    val b = BitmapUtil.fromBytes(many)
    assert(a.keySet() === b.keySet())
    a.keySet().forEach { k =>
      assert(java.util.Arrays.equals(a.get(k), b.get(k)), s"page $k differs")
    }
  }

  test("two-level OR-merge == direct build (sketch algebra)") {
    val df = ids.zipWithIndex.map { case (id, i) => (i % 7, id) }.toDF("g", "id")
    val direct = df.agg(vf.bitmap_cardinality(vf.bitmap_agg($"id"))).head().getLong(0)
    val twoLevel = df.groupBy($"g").agg(vf.bitmap_agg($"id").as("bm"))
      .agg(vf.bitmap_cardinality(vf.bitmap_or_agg($"bm"))).head().getLong(0)
    assert(twoLevel === direct)
  }

  test("serialization round-trips sparse and dense pages") {
    val pages = BitmapUtil.newPages()
    (0L to 60000L).foreach(BitmapUtil.add(pages, _))      // dense page 0
    Seq(70000L, 131072L, 9999999L).foreach(BitmapUtil.add(pages, _)) // sparse
    val back = BitmapUtil.fromBytes(BitmapUtil.toBytes(pages))
    assert(BitmapUtil.cardinality(back) === BitmapUtil.cardinality(pages))
    assert(back.keySet() === pages.keySet())
    pages.keySet().forEach { k =>
      assert(java.util.Arrays.equals(back.get(k), pages.get(k)))
    }
  }

  test("negative ids fail loudly; nulls are skipped; foreign bytes rejected") {
    val err = intercept[org.apache.spark.SparkException] {
      Seq(-1L).toDF("id").agg(vf.bitmap_agg($"id")).head()
    }
    assert(err.getMessage.contains("non-negative") ||
      Option(err.getCause).exists(_.getMessage.contains("non-negative")))
    val withNull = Seq[java.lang.Long](1L, null, 2L).toDF("id")
      .agg(vf.bitmap_cardinality(vf.bitmap_agg($"id"))).head().getLong(0)
    assert(withNull === 2L)
    intercept[Exception] {
      BitmapUtil.fromBytes(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    }
  }

  test("SQL registration: bitmap family callable from SQL") {
    Seq(1L, 2L, 2L, 3L).toDF("id").createOrReplaceTempView("bm_ids")
    val n = spark.sql(
      "SELECT bitmap_cardinality(bitmap_agg(id)) AS n FROM bm_ids").head().getLong(0)
    assert(n === 3L)
  }

  test("AND cardinality == exact set intersection (incl. cross-page)") {
    val a = BitmapUtil.newPages()
    val b = BitmapUtil.newPages()
    val setA = ((0L to 500L by 3) ++ Seq(65535L, 65536L, 10000000L)).toSet
    val setB = ((0L to 500L by 5) ++ Seq(65536L, 9999999L)).toSet
    setA.foreach(BitmapUtil.add(a, _))
    setB.foreach(BitmapUtil.add(b, _))
    val want = (setA intersect setB).size.toLong
    assert(BitmapUtil.andCardinality(a, b) === want)
    assert(BitmapUtil.andCardinality(b, a) === want, "AND must be symmetric")
  }

  test("AND via serialized bytes, empty intersection, and SQL surface") {
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 3L), (1, 4L), (2, 900000L))
      .toDF("g", "id")
    val bms = df.groupBy($"g").agg(vf.bitmap_agg($"id").as("bm"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    def and(x: Int, y: Int): Long =
      BitmapUtil.andCardinality(BitmapUtil.fromBytes(bms(x)), BitmapUtil.fromBytes(bms(y)))
    assert(and(0, 1) === 1L)   // {3}
    assert(and(0, 2) === 0L)   // disjoint pages — no shared page ids at all
    assert(and(1, 2) === 0L)
    df.createOrReplaceTempView("bm_and_ids")
    val viaSql = spark.sql(
      """SELECT bitmap_and_cardinality(a.bm, b.bm) AS n FROM
        |  (SELECT bitmap_agg(id) AS bm FROM bm_and_ids WHERE g = 0) a,
        |  (SELECT bitmap_agg(id) AS bm FROM bm_and_ids WHERE g = 1) b""".stripMargin)
      .head().getLong(0)
    assert(viaSql === 1L)
  }

  test("AND is partition-invariant: |A∩B| stable under input repartition") {
    val rows = (0L until 5000L).map(i => (if (i % 2 == 0) "x" else "y", i / 3))
    def overlap(parts: Int): Long = {
      val bm = rows.toDF("g", "id").repartition(parts)
        .groupBy($"g").agg(vf.bitmap_agg($"id").as("bm"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      BitmapUtil.andCardinality(
        BitmapUtil.fromBytes(bm("x")), BitmapUtil.fromBytes(bm("y")))
    }
    assert(overlap(1) === overlap(17))
  }
}
