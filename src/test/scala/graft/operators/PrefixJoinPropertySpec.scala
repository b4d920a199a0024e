package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential test of the global prefix-filtering similarity join
  * (PPJoin candidate pruning: prefix + size + positional filters)
  * against the quadratic brute force, on seeded random corpora built to
  * stress the filters: small vocabulary (many shared tokens), skewed
  * document sizes (size filter active), and duplicated/near-duplicated
  * sets (pairs meeting at several tokens — the distinct path).
  * Exercises the SAME `prefixSimilarityJoin` code path as the
  * `d_prefix_join` driver query, at thresholds beside the query's 0.7.
  */
class PrefixJoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(docs: Seq[(Long, Set[String])], tNum: Int, tDen: Int)
      : Set[(Long, Long, Long, Long)] =
    (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = sa.intersect(sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * tDen >= union * tNum
    } yield (ia, ib, inter, union)).toSet

  private def run(docs: Seq[(Long, Set[String])], tNum: Int, tDen: Int)
      : Set[(Long, Long, Long, Long)] = {
    val df = docs.map { case (id, s) => (id, s.toSeq.sorted) }
      .toDF("doc_id", "toks")
    TextQueries.prefixSimilarityJoin(df, tNum, tDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def corpus(seed: Int, n: Int, vocab: Int,
                     minSz: Int, maxSz: Int): Seq[(Long, Set[String])] = {
    val rnd = new Random(seed)
    val base = (0 until n).map { i =>
      val sz = minSz + rnd.nextInt(maxSz - minSz + 1)
      (i.toLong, (0 until sz).map(_ => s"t${rnd.nextInt(vocab)}").toSet)
    }
    // plant near-duplicates: copy some sets with one token swapped, so
    // high-J pairs exist at every size and pairs meet at MANY tokens
    val planted = base.take(n / 4).map { case (id, s) =>
      val dropped = s.drop(1) + s"t${rnd.nextInt(vocab)}"
      (id + 10000L, dropped)
    }
    base ++ planted
  }

  test("prefix join equals brute force at t=0.7 on a dense small-vocab corpus") {
    val docs = corpus(seed = 1, n = 120, vocab = 40, minSz = 3, maxSz = 20)
    val expected = brute(docs, 7, 10)
    assert(expected.nonEmpty, "fixture produced no similar pairs — not a meaningful test")
    assert(run(docs, 7, 10) === expected)
  }

  test("prefix join equals brute force at t=0.5 (longer prefixes, more candidates)") {
    val docs = corpus(seed = 2, n = 100, vocab = 25, minSz = 2, maxSz = 12)
    val expected = brute(docs, 1, 2)
    assert(expected.size > 20, s"fixture too sparse: ${expected.size}")
    assert(run(docs, 1, 2) === expected)
  }

  test("prefix join equals brute force at t=0.9 (prefix length 1 edge case)") {
    // at t=0.9 small sets have prefix length exactly 1 — the tightest
    // prefix the completeness argument allows
    val docs = corpus(seed = 3, n = 150, vocab = 30, minSz = 4, maxSz = 10)
    val expected = brute(docs, 9, 10)
    assert(expected.nonEmpty)
    assert(run(docs, 9, 10) === expected)
  }

  test("identical sets and size-1 sets survive the filters") {
    val docs: Seq[(Long, Set[String])] = Seq(
      1L -> Set("a", "b", "c"), 2L -> Set("a", "b", "c"), // J = 1 exactly
      3L -> Set("a"), 4L -> Set("a"),                     // size-1 twins
      5L -> Set("z"), 6L -> Set("a", "b"))                // non-pairs
    val expected = brute(docs, 7, 10)
    assert(expected === Set((1L, 2L, 3L, 3L), (3L, 4L, 1L, 1L)))
    assert(run(docs, 7, 10) === expected)
  }
}
