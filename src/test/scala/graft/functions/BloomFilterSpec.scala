package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{VariantFunctions => vf}

/** Bloom-filter semi-join reduction properties (BloomFilter.scala):
  * the bits that make pruned-join ≡ exact join at any scale.
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val BITS = 1 << 14
  private val HASHES = 5

  test("no false negatives: every inserted key probes true (long + string)") {
    val keys = (1L to 2000L).map(_ * 7919L)
    val bf = keys.toDF("k").agg(vf.bloom_agg($"k", BITS, HASHES).as("bf"))
    val misses = keys.toDF("k")
      .crossJoin(broadcast(bf))
      .filter(!vf.bloom_might_contain($"bf", $"k"))
      .count()
    assert(misses === 0L)

    val skeys = keys.map(k => s"key-$k")
    val sbf = skeys.toDF("k").agg(vf.bloom_agg($"k", BITS, HASHES).as("bf"))
    val smisses = skeys.toDF("k")
      .crossJoin(broadcast(sbf))
      .filter(!vf.bloom_might_contain($"bf", $"k"))
      .count()
    assert(smisses === 0L)
  }

  test("merge ≡ single-partition build: bitset independent of partitioning") {
    val keys = (1L to 5000L).toDF("k")
    val one = keys.repartition(1).agg(vf.bloom_agg($"k", BITS, HASHES)).head.getAs[Array[Byte]](0)
    val many = keys.repartition(13).agg(vf.bloom_agg($"k", BITS, HASHES)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("false-positive rate is in the expected regime, not degenerate") {
    // n=2000, m=2^14, k=5 → theoretical fp ≈ (1-e^(-kn/m))^k ≈ 2.2%
    val bf = (1L to 2000L).toDF("k").agg(vf.bloom_agg($"k", BITS, HASHES).as("bf"))
    val probes = (1000001L to 1020000L).toDF("k")
    val fp = probes.crossJoin(broadcast(bf))
      .filter(vf.bloom_might_contain($"bf", $"k"))
      .count()
    val rate = fp.toDouble / 20000
    assert(rate > 0.0005 && rate < 0.10, s"fp rate $rate outside sane regime")
  }

  test("null keys probe false (inner-join pruning is exact)") {
    val bf = (1L to 100L).toDF("k").agg(vf.bloom_agg($"k", BITS, HASHES).as("bf"))
    val n = Seq[java.lang.Long](1L, null, 50L).toDF("k")
      .crossJoin(broadcast(bf))
      .filter(vf.bloom_might_contain($"bf", $"k"))
      .count()
    assert(n === 2L)
  }

  test("SQL registration: bloom_agg + bloom_might_contain compose in spark.sql") {
    (1L to 500L).toDF("k").createOrReplaceTempView("bloom_keys")
    val out = spark.sql(
      """SELECT COUNT(*) AS n FROM bloom_keys,
        |  (SELECT bloom_agg(k, 16384, 5) AS bf FROM bloom_keys)
        |WHERE bloom_might_contain(bf, k)""".stripMargin).head.getLong(0)
    assert(out === 500L)
  }

  test("malformed bitset bytes raise a clear error, not an index crash") {
    val e = intercept[Exception] {
      spark.sql("SELECT bloom_might_contain(CAST('garbage' AS BINARY), 1L)").head
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("not a bloom_agg bitset")),
      msgs(e).mkString(" | "))
  }

  test("serialized form round-trips through the header") {
    val bytes = (1L to 10L).toDF("k")
      .agg(vf.bloom_agg($"k", 64 * 4, 3)).head.getAs[Array[Byte]](0)
    val (bits, hashes, words) = BloomUtil.fromBytes(bytes)
    assert(bits === 256 && hashes === 3 && words.length === 4)
    assert(words.exists(_ != 0L))
  }
}
