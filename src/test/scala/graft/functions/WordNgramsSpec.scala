package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** WordNgrams / NgramXxhash64 — the compiled n-gram kernels that
  * replaced the interpreted `transform(sequence(...))` higher-order
  * forms in the gram-building dedup/curation lanes (r13 optimization).
  * Property: bit-identical to the HOF formulations they replaced —
  * the unguarded `greatest` shingle form on EVERY input size (0, 1,
  * < n, == n, > n) including null elements (concat_ws skips them),
  * the guarded `size >= n` form at the call sites, and per-window
  * xxhash64 equal to Spark's own `xxhash64(slice(w, i, n))`.
  */
class WordNgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def greatestHof(n: Int) =
    s"transform(sequence(0, greatest(size(t) - $n, 0)), " +
      s"i -> concat_ws(' ', slice(t, i + 1, $n)))"

  private def guardedHof(n: Int) =
    s"transform(sequence(0, size(t) - $n), " +
      s"i -> concat_ws(' ', slice(t, i + 1, $n)))"

  private def hashHof(n: Int) =
    s"transform(sequence(1, size(t) - ${n - 1}), i -> xxhash64(slice(t, i, $n)))"

  private def randomRows(seed: Int, minLen: Int): Seq[(Int, Seq[String])] = {
    val rnd = new Random(seed)
    (0 until 400).map { i =>
      val m = minLen + rnd.nextInt(20)
      val toks = Seq.fill(m) {
        if (rnd.nextInt(20) == 0) null
        else rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
      }
      (i, toks)
    }
  }

  test("word_ngrams equals the greatest-guarded HOF on every input size") {
    for (n <- Seq(2, 3, 4, 8)) {
      val edge = Seq(
        (1000, Seq.empty[String]),
        (1001, Seq("a")),
        (1002, Seq(null.asInstanceOf[String], null)),
        (1003, Seq.fill(n - 1)("x")),
        (1004, Seq.fill(n)("y")))
      val df = (randomRows(7 + n, 0) ++ edge).toDF("i", "t")
        .select(col("i"),
          VariantFunctions.word_ngrams(col("t"), n).as("k"),
          expr(greatestHof(n)).as("h"))
      val bad = df.filter(not(col("k") <=> col("h"))).count()
      assert(bad === 0, s"n=$n")
    }
  }

  test("word_ngrams equals the size>=n call-site HOF on guarded inputs") {
    for (n <- Seq(2, 3, 4, 8)) {
      val df = randomRows(11 + n, n).toDF("i", "t")
        .select(col("i"),
          VariantFunctions.word_ngrams(col("t"), n).as("k"),
          expr(guardedHof(n)).as("h"))
      val bad = df.filter(not(col("k") <=> col("h"))).count()
      assert(bad === 0, s"n=$n")
    }
  }

  test("word_ngrams against a plain Scala reference, independent of Spark") {
    val rows = randomRows(13, 0)
    val got = rows.toDF("i", "t")
      .select(col("i"), VariantFunctions.word_ngrams(col("t"), 3).as("k"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    rows.foreach { case (i, toks) =>
      val m = toks.length
      val want = (0 until math.max(m - 3 + 1, 1)).map { w =>
        toks.slice(w, math.min(w + 3, m)).filter(_ != null).mkString(" ")
      }
      assert(got(i) === want, s"case $i")
    }
  }

  test("ngram_xxhash64 equals xxhash64(slice(...)) per window") {
    for (n <- Seq(2, 4, 8)) {
      val df = randomRows(17 + n, n).toDF("i", "t")
        .select(col("i"),
          VariantFunctions.ngram_xxhash64(col("t"), n).as("k"),
          expr(hashHof(n)).as("h"))
      val bad = df.filter(not(col("k") <=> col("h"))).count()
      assert(bad === 0, s"n=$n")
    }
  }

  test("ngram_xxhash64 yields empty on m < n and null on null input") {
    val df = Seq((0, Seq("a", "b", "c"))).toDF("i", "t")
      .select(VariantFunctions.ngram_xxhash64(col("t"), 8).as("k"))
    assert(df.collect().head.getSeq[Long](0).isEmpty)
    val nr = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS t")
      .select(VariantFunctions.ngram_xxhash64(col("t"), 4).as("k")).collect()
    assert(nr.head.isNullAt(0))
    // and the SQL registration works
    val viaSql = spark.sql(
      "SELECT word_ngrams(array('a','b','c'), 2) AS g, " +
        "ngram_xxhash64(array('a','b','c'), 2) AS h").collect().head
    assert(viaSql.getSeq[String](0) === Seq("a b", "b c"))
    assert(viaSql.getSeq[Long](1).length === 2)
  }
}
