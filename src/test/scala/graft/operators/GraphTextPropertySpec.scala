package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests for the round-5 graph/text operators, each against a
  * brute-force reference on seeded random inputs — the same differential
  * style as QuantilesSpec / ConnectedComponentsSpec.
  */
class GraphTextPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- FastSS deletion-neighborhood completeness ------------------------

  private def deletions(s: String): Set[String] =
    (0 to s.length).map {
      case 0 => s
      case i => s.substring(0, i - 1) + s.substring(i)
    }.toSet

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("FastSS: deletion neighborhoods never miss an edit-distance-<=1 pair") {
    // The neighborhood join is a SUPERSET generator: lev <= 1 must imply
    // the neighborhoods intersect (no false negatives — completeness).
    // The converse does NOT hold ('aac' vs 'aca' share deletion 'aa' at
    // distance 2), which is exactly why d_fuzzy_join verifies every
    // candidate with levenshtein before counting it.
    val rnd = new Random(42)
    val alphabet = "abc" // small alphabet forces many near-miss pairs
    val strs = Seq.fill(300)(
      (0 until (3 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(3))).mkString)
    var nearPairs = 0
    for (a <- strs.take(120); b <- strs.take(120) if lev(a, b) <= 1) {
      nearPairs += 1
      assert(deletions(a).intersect(deletions(b)).nonEmpty,
        s"FastSS missed '$a' vs '$b' at lev=${lev(a, b)}")
    }
    assert(nearPairs > 100, s"fixture too sparse to be meaningful: $nearPairs")
    // and at least one distance-2 pair DOES collide, proving the verify
    // filter is load-bearing, not decorative
    assert(deletions("aac").intersect(deletions("aca")).nonEmpty && lev("aac", "aca") == 2)
  }

  // --- Skyline: bucketed plan equals brute force ------------------------

  test("bucket-pruned skyline equals the quadratic reference on random points") {
    val rnd = new Random(7)
    // duplicate prices on purpose: the per-price collapse must pick max date
    val pts = Seq.fill(500)((rnd.nextInt(80) * 100.0, rnd.nextInt(1000).toLong))
    val df = pts.toDF("price", "ms")

    val perPrice = df.groupBy(col("price")).agg(max(col("ms")).as("best_ms"))
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("price").desc)
      .rowsBetween(Long.MinValue, -1)
    val local = perPrice.withColumn("bucket", floor(col("price") / 1000))
      .withColumn("hm", max(col("best_ms")).over(bw))
      .filter(col("hm").isNull || col("best_ms") > col("hm"))
    val gw = org.apache.spark.sql.expressions.Window
      .orderBy(col("price").desc).rowsBetween(Long.MinValue, -1)
    val got = local.withColumn("ghm", max(col("best_ms")).over(gw))
      .filter(col("ghm").isNull || col("best_ms") > col("ghm"))
      .select(col("price"), col("best_ms"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet

    // brute force: a point survives iff no other point dominates it
    val collapsed = pts.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).max) }.toSeq
    val want = collapsed.filter { case (p, m) =>
      !collapsed.exists { case (p2, m2) =>
        (p2 >= p && m2 >= m) && (p2 > p || m2 > m)
      }
    }.toSet
    assert(got == want)
  }

  // --- Triangle counting: orientation equals brute force ----------------

  test("degree-oriented triangle count equals brute force on random graphs") {
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val n = 30
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.15
      } yield (i.toLong, j.toLong)).toSeq
      val e0 = edges.toDF("i", "j")

      val deg = e0.select(col("i").as("v")).unionAll(e0.select(col("j").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val ranked = e0
        .join(deg.withColumnRenamed("v", "i").withColumnRenamed("deg", "di"), "i")
        .join(deg.withColumnRenamed("v", "j").withColumnRenamed("deg", "dj"), "j")
      val dir = ranked.select(
        when(col("di") < col("dj") || (col("di") === col("dj") && col("i") < col("j")),
          col("i")).otherwise(col("j")).as("src"),
        when(col("di") < col("dj") || (col("di") === col("dj") && col("i") < col("j")),
          col("j")).otherwise(col("i")).as("dst"))
      val wedges = dir.as("e1").join(dir.as("e2"), col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      val got = wedges.join(dir.as("e3"),
          col("e3.src") === col("u") && col("e3.dst") === col("w"), "left_semi")
        .count()

      val es = edges.toSet
      def has(a: Long, b: Long) = es.contains((a min b, a max b))
      val want = (for {
        a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if has(a, b) && has(b, c) && has(a, c)
      } yield 1).size
      assert(got == want.toLong, s"trial $trial: oriented=$got brute=$want")
    }
  }

  // --- k-core peel (KCore.peelRounds) -----------------------------------

  /** In-memory reference peel: repeat until fixpoint or budget. */
  private def bruteKcore(edges: Set[(Long, Long)], k: Int, rounds: Int): Seq[Set[(Long, Long)]] = {
    var e = edges
    (1 to rounds).map { _ =>
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (v, o) => (v, o.size) }
      e = e.filter { case (i, j) => deg(i) >= k && deg(j) >= k }
      e
    }
  }

  test("k-core: distributed peel matches the in-memory peel round by round") {
    for (trial <- 1 to 3) {
      val rnd = new Random(900 + trial)
      val n = 40
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.06
      } yield (i.toLong, j.toLong)).toSet
      val got = KCore.peelRounds(edges.toSeq.toDF("i", "j"), k = 3, rounds = 4)
        .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      val want = bruteKcore(edges, k = 3, rounds = 4)
      got.zip(want).zipWithIndex.foreach { case ((g, w), r) =>
        assert(g == w, s"trial $trial round ${r + 1}: got ${g.size}, want ${w.size}")
      }
    }
  }

  test("jaro_winkler: pinned reference values (bit-exact vs the oracle engine) and invariants") {
    import graft.functions.JaroWinklerImpl.jw
    // values cross-checked against DuckDB jaro_winkler_similarity,
    // including last-ulp cases — bit equality, not approximate
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334) // j>0.7 but no common prefix
    assert(jw("DwAyNE", "DuANE") == 0.8400000000000001)
    assert(jw("a", "a") == 1.0 && jw("abc", "") == 0.0 && jw("", "") == 1.0)
    // symmetry on random strings
    val r = new Random(11)
    (1 to 200).foreach { _ =>
      val a = Random.alphanumeric.take(r.nextInt(12)).mkString
      val b = Random.alphanumeric.take(r.nextInt(12)).mkString
      val s = jw(a, b)
      assert(s == jw(b, a) && s >= 0.0 && s <= 1.0)
    }
  }

  test("k-core: d_kcore's fixture graph reaches its 2-core fixpoint by round 3") {
    val p = graft.Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), substring(col("text"), 1, 10).as("pf"))
    val e0 = p.as("a").join(p.as("b"),
        col("a.pf") === col("b.pf") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    val rounds = KCore.peelRounds(e0, k = 2, rounds = 4)
    val r3 = rounds(2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r4 = rounds(3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r3 == r4, s"round 3 (${r3.size} edges) != round 4 (${r4.size} edges)")
    assert(r3.nonEmpty, "degenerate fixture: empty 2-core")
  }

  test("d_label_prop: distributed rounds match an in-memory synchronous reference") {
    val lab = graft.Queries.queryMap("d_label_prop")(spark, TestSpark.SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0 = graft.Tables.orders(spark, TestSpark.SF)
      .select((col("o_custkey") % 100).as("a"), (col("o_orderkey") % 100).as("b"))
      .filter(col("a") =!= col("b")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e0 ++ e0.map(_.swap)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var ref: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      val prev = ref
      ref = adj.map { case (n, nbrs) =>
        val best = nbrs.groupBy(prev).map { case (l, xs) => (l, xs.size) }
          .toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        n -> best
      }
    }
    assert(lab === ref)
    // the fixture graph must actually coarsen: fewer communities than nodes
    assert(lab.values.toSet.size < lab.size,
      "degenerate fixture: every node kept its own label")
  }
}
