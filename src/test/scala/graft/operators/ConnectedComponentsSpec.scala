package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components: correctness against a
  * local union-find model on random graphs, and the O(log n) round
  * bound on the pathological case for plain label propagation — a long
  * chain, where propagation needs diameter-many rounds.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local reference: union-find with path compression. */
  private def model(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize roots to component minimum (union by min above keeps
    // the min as root, but re-find to compress)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val (labels, iters) =
      ConnectedComponents.labelComponents(edges.toDF("u", "v"))
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, iters)
  }

  test("matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(20260813L)
    // 300 nodes over a sparse id space, ~200 random edges → a mix of
    // singleton pairs, small trees, and a few larger components
    val edges = (1 to 200).map { _ =>
      (rnd.nextInt(300).toLong * 7 + 3, rnd.nextInt(300).toLong * 7 + 3)
    }.filter(e => e._1 != e._2)
    val (got, _) = run(edges)
    assert(got === model(edges))
  }

  test("chain of 256 nodes converges in O(log n) rounds, not diameter") {
    // ids shuffled so the chain is not already min-rooted
    val rnd = new scala.util.Random(7L)
    val ids = rnd.shuffle((0L until 256L).toVector)
    val edges = ids.sliding(2).map(w => (w(0), w(1))).toSeq
    val (got, iters) = run(edges)
    val lo = ids.min
    assert(got.values.toSet === Set(lo), "every chain node labels to the minimum")
    assert(got.size === 256)
    // diameter is 255; Kiveris alternation must land in ~log2(256)=8
    // rounds plus slack for the star-normalization tail
    assert(iters <= 12, s"took $iters rounds — diameter-bound behavior, not O(log n)")
  }

  test("two components with interleaved ids stay separate") {
    val e1 = Seq((10L, 20L), (20L, 30L), (30L, 40L))
    val e2 = Seq((15L, 25L), (25L, 35L))
    val (got, _) = run(e1 ++ e2)
    assert(got === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      15L -> 15L, 25L -> 15L, 35L -> 15L))
  }

  test("empty edge set yields empty labels") {
    val (labels, iters) = ConnectedComponents.labelComponents(
      Seq.empty[(Long, Long)].toDF("u", "v"))
    assert(labels.count() === 0 && iters === 0)
  }

  test("self loops and duplicate edges are ignored") {
    val (got, _) = run(Seq((5L, 5L), (5L, 9L), (9L, 5L), (5L, 9L)))
    assert(got === Map(5L -> 5L, 9L -> 5L))
  }
}
