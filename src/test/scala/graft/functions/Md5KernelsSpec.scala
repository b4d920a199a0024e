package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Md5MinhashSig / WinnowFps — the compiled md5-keyed kernels that
  * replaced the interpreted nested-HOF signature and winnowing chains
  * in the hash-gate dedup twins (r13 optimization; both consumers are
  * 100×-curve lanes). Property: bit-identical to the HOF formulations
  * they replaced, on random token arrays / texts including multi-byte
  * UTF-8, null elements, ties, and the empty edge.
  */
class Md5KernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sigHof(h: Int) =
    s"""transform(sequence(1, $h), k ->
       |  array_min(transform(s, x -> md5(concat(CAST(k AS STRING), ':', x)))))"""
      .stripMargin

  private val winnowHofG =
    """transform(sequence(0, length(text) - 7), i ->
      |  concat(md5(substring(text, i + 1, 7)), ':',
      |         lpad(CAST(i AS STRING), 8, '0')))""".stripMargin
  private val winnowHof =
    s"""array_sort(array_distinct(transform(sequence(0, size($winnowHofG) - 4),
       |  j -> array_min(slice($winnowHofG, j + 1, 4)))))""".stripMargin

  test("minhash_md5_sig equals the nested HOF on random token arrays") {
    val rnd = new Random(23)
    val rows = (0 until 300).map { i =>
      val m = 1 + rnd.nextInt(30)
      val toks = Seq.fill(m) {
        if (rnd.nextInt(25) == 0) null
        else if (rnd.nextInt(10) == 0) "héllo wörld 中文" + rnd.nextInt(5)
        else rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString
      }
      (i, toks)
    } ++ Seq(
      (1000, Seq.empty[String]),
      (1001, Seq(null.asInstanceOf[String])),
      (1002, Seq("dup", "dup", "dup")))
    for (h <- Seq(1, 8)) {
      val df = rows.toDF("i", "s")
        .select(col("i"),
          VariantFunctions.minhash_md5_sig(col("s"), h).as("k"),
          expr(sigHof(h)).as("m"))
      val bad = df.filter(not(col("k") <=> col("m"))).count()
      assert(bad === 0, s"h=$h")
    }
  }

  test("winnow_fps equals the two-stage HOF chain on random texts") {
    val rnd = new Random(31)
    val alphas = Seq("abcdefgh ", "aab ", "héé中ü ", "xy")
    val rows = (0 until 300).map { i =>
      val alpha = alphas(rnd.nextInt(alphas.length))
      val len = 10 + rnd.nextInt(60)
      val text = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      (i, text)
    } ++ Seq(
      (1000, "aaaaaaaaaa"),          // all grams identical: digest ties
      (1001, "0123456789"),          // exactly k + w - 1 chars: one window
      (1002, "中中中中中中中中中中")) // 10 multi-byte chars
    val df = rows.toDF("i", "text")
      .select(col("i"),
        VariantFunctions.winnow_fps(col("text"), 7, 4).as("k"),
        expr(winnowHof).as("m"))
    val bad = df.filter(not(col("k") <=> col("m"))).count()
    assert(bad === 0)
  }

  test("winnow_fps yields empty below the guard; SQL registration works") {
    val r = spark.sql(
      "SELECT winnow_fps('short', 7, 4) AS a, " +
        "size(winnow_fps('0123456789', 7, 4)) AS b, " +
        "minhash_md5_sig(array('x'), 2) AS c").collect().head
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getInt(1) === 1)
    assert(r.getSeq[String](2).length === 2)
  }
}
