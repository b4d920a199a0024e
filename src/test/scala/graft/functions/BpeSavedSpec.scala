package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** BpeSaved — the compiled one-pass twin of d_bpe_apply's two
  * interpreted `aggregate(transform(words, w -> ...))` HOFs (r13
  * optimization; d_bpe_apply is a 100×-curve lane). Property:
  * bit-identical to the generated replace-chain expression
  * (PipelineQueries.bpeCountExprForTest) per word AND to the two
  * aggregate sums per document, on random words plus merge-rich /
  * chained-merge / boundary-overlap cases.
  */
class BpeSavedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val merges = graft.operators.PipelineQueries.bpeMerges
  private val cnt = graft.operators.PipelineQueries.bpeCountExprForTest

  test("bpe_saved equals the aggregate(transform(...)) HOF pair per document") {
    val rnd = new Random(41)
    val vocab = Seq("the", "theater", "and", "anding", "in", "ing", "start",
      "rest", "ou", "es", "thethe", "ananan", "q", "zzz", "onion", "ore")
    val rows = (0 until 300).map { i =>
      val m = rnd.nextInt(25)
      val words = Seq.fill(m) {
        if (rnd.nextInt(3) == 0) vocab(rnd.nextInt(vocab.length))
        else (0 until 1 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }
      (i, words)
    } :+ ((1000, Seq.empty[String]))
    val df = rows.toDF("i", "words")
      .select(col("i"),
        VariantFunctions.bpe_saved(col("words"), merges).as("k"),
        expr("aggregate(transform(words, w -> CAST(length(w) AS BIGINT)), " +
          "0L, (a, x) -> a + x)").as("h_base"),
        expr(s"aggregate(transform(words, w -> $cnt), 0L, (a, x) -> a + x)")
          .as("h_merged"))
    val bad = df.filter(
      not(col("k.n_base") <=> col("h_base")) ||
        not(col("k.n_merged") <=> col("h_merged"))).count()
    assert(bad === 0)
  }

  test("per-word merged count matches the replace chain on adversarial words") {
    // boundary-overlap: two occurrences of one pair sharing a token
    // boundary merge left-to-right non-overlapping; chained merges
    // (t+h, th+e) build on earlier outputs
    val words = Seq("ththth", "thethethe", "ananan", "inging", "tthhee",
      "aandd", "sstt", "ouou", "eses", "a", "")
    val df = words.map(w => Tuple1(Seq(w))).toDF("words")
      .select(
        VariantFunctions.bpe_saved(col("words"), merges).as("k"),
        expr(s"aggregate(transform(words, w -> $cnt), 0L, (a, x) -> a + x)")
          .as("h"))
    df.collect().foreach { r =>
      assert(r.getStruct(0).getLong(1) === r.getLong(1))
    }
  }

  test("astral (supplementary-plane) codepoints segment like the HOF's split") {
    // r13 ADVICE: the sentinel join must iterate by CODEPOINT — a
    // UTF-16-unit walk would split a surrogate pair into two segments,
    // counting one extra token per astral char vs split(w, '')
    val words = Seq("a𝄞b", "𝄞", "😀😀", "thé𝄞")
    val df = words.map(w => Tuple1(Seq(w))).toDF("words")
      .select(
        VariantFunctions.bpe_saved(col("words"), merges).as("k"),
        expr("aggregate(transform(words, w -> CAST(length(w) AS BIGINT)), " +
          "0L, (a, x) -> a + x)").as("h_base"),
        expr(s"aggregate(transform(words, w -> $cnt), 0L, (a, x) -> a + x)")
          .as("h_merged"))
    df.collect().foreach { r =>
      assert(r.getStruct(0).getLong(0) === r.getLong(1))
      assert(r.getStruct(0).getLong(1) === r.getLong(2))
    }
  }

  test("null array ELEMENT nulls the result (and the expression is nullable)") {
    // r13 ADVICE: with a non-null child whose array has
    // containsNull=true, codegen must keep the null branch
    val e = BpeSaved(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("a", null), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = true)), merges)
    assert(e.nullable)
    val r = spark.sql("SELECT array('a', CAST(NULL AS STRING)) AS words")
      .select(VariantFunctions.bpe_saved(col("words"), merges).as("k"))
      .collect()
    assert(r.head.isNullAt(0))
  }
}
