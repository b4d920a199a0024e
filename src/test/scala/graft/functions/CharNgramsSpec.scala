package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** CharNgrams — the compiled twin of the per-token char-bigram HOF
  * `transform(sequence(1, length(tok) - n + 1), i -> substring(tok, i, n))`
  * in d_bpe_merge (r13 optimization). Property: bit-identical on
  * random tokens including multi-byte codepoints; empty below the
  * length >= n call-site guard.
  */
class CharNgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("char_ngrams equals the substring HOF on guarded inputs") {
    val rnd = new Random(53)
    val alphabet = "abcdefghé中üß"
    for (n <- Seq(2, 3)) {
      val rows = (0 until 300).map { i =>
        val len = n + rnd.nextInt(12)
        (i, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      val df = rows.toDF("i", "tok")
        .select(col("i"),
          VariantFunctions.char_ngrams(col("tok"), n).as("k"),
          expr(s"transform(sequence(1, length(tok) - ${n - 1}), " +
            s"i -> substring(tok, i, $n))").as("h"))
      val bad = df.filter(not(col("k") <=> col("h"))).count()
      assert(bad === 0, s"n=$n")
    }
  }

  test("char_ngrams yields empty below the guard; SQL registration works") {
    val r = spark.sql(
      "SELECT char_ngrams('a', 2) AS a, char_ngrams('abc', 2) AS b").collect().head
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getSeq[String](1) === Seq("ab", "bc"))
  }
}
