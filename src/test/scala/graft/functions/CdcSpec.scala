package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Content-defined chunking invariants: structural bounds (lengths
  * partition the input, min/max respected), determinism, and the
  * property that justifies CDC over a fixed grid — chunk identity
  * survives a prefix edit.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val fn = VariantFunctions

  private def chunksOf(text: String, minLen: Int = 64, maskBits: Int = 6,
                       maxLen: Int = 512): Seq[(Long, Int)] =
    Seq(text).toDF("t")
      .select(fn.cdc_chunks(col("t"), minLen, maskBits, maxLen).as("c"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getInt(1)))

  private def randomText(seed: Long, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) { sb.append(('a' + rnd.nextInt(26)).toChar) }
    sb.toString
  }

  test("chunk lengths partition the input and respect min/max bounds") {
    val text = randomText(1L, 10000)
    val cs = chunksOf(text)
    assert(cs.map(_._2).sum === text.getBytes("UTF-8").length)
    // every chunk except possibly the last is >= minLen; all <= maxLen
    cs.init.foreach { case (_, len) => assert(len >= 64 && len <= 512) }
    assert(cs.last._2 <= 512)
    assert(cs.size > 5, "parameters should cut a 10k doc into many chunks")
  }

  test("deterministic: same text, same chunks") {
    val text = randomText(2L, 5000)
    assert(chunksOf(text) === chunksOf(text))
  }

  test("prefix edit: CDC keeps most chunk hashes, a fixed grid keeps none") {
    val text = randomText(3L, 8000)
    val shifted = "BOILERPLATE-HEADER " + text
    val a = chunksOf(text).map(_._1).toSet
    val b = chunksOf(shifted).map(_._1).toSet
    val overlap = a.intersect(b).size.toDouble / a.size
    assert(overlap >= 0.6, s"CDC overlap after prefix edit: $overlap")

    // the fixed-size grid over the same pair shares (at most) a sliver:
    // every boundary moved by the prefix length
    def fixedHashes(t: String): Set[Long] = {
      val bytes = t.getBytes("UTF-8")
      bytes.grouped(100).zipWithIndex
        .map { case (g, _) => Hash64.fnv1a(g, 0, g.length, 0L) }.toSet
    }
    val fa = fixedHashes(text); val fb = fixedHashes(shifted)
    val fixedOverlap = fa.intersect(fb).size.toDouble / fa.size
    assert(fixedOverlap < 0.1, s"fixed-grid overlap unexpectedly high: $fixedOverlap")
  }

  test("suffix edit leaves the head chunks identical") {
    val text = randomText(4L, 6000)
    val a = chunksOf(text)
    val b = chunksOf(text + " TRAILING-FOOTER")
    // all chunks before the last boundary are byte-identical
    assert(a.init.zip(b).takeWhile { case (x, y) => x == y }.size >= a.size - 2)
  }

  test("degenerate inputs") {
    assert(chunksOf("") === Seq.empty)
    val one = chunksOf("tiny")
    assert(one.size === 1 && one.head._2 === 4)
    // a doc below minLen is one chunk regardless of content
    assert(chunksOf(randomText(5L, 63)).size === 1)
  }

  test("SQL registration works") {
    val n = spark.sql(
      "SELECT size(cdc_chunks('" + randomText(6L, 2000) + "')) AS n")
      .head.getInt(0)
    assert(n > 1)
  }
}
