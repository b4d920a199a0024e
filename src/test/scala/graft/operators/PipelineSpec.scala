package graft.operators

import graft.{Queries, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-8 pipeline operators (PipelineQueries.scala)
  * beyond their DuckDB oracle rows: label-constraint soundness and a
  * full Scala brute-force differential for the similarity pair, audit
  * invariants for k-anonymity, and partition invariance for the drift
  * monitor (all-integer aggregates must not care how the scan splits).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    Queries.queryMap(name)(spark, TestSpark.SF)

  /** Collected (vec_id, label, embedding) fixture — 50 vectors at
    * sf0.001, small enough for exact quadratic reference math. */
  private lazy val vecs: Seq[(Long, Int, Array[Float])] =
    Tables.embeddings(spark, TestSpark.SF)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq

  /** Same accumulation order as the vec_cosine kernel: left-to-right
    * doubles for dot and both norms. */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("e_hard_negatives: exact brute-force differential + label constraint") {
    val rows = q("e_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLabel = vecs.map(v => v._1 -> v._2).toMap
    // no returned negative may share its probe's label
    rows.foreach { case (qid, _, nid, negLabel) =>
      assert(byLabel(nid).toLong === negLabel)
      assert(byLabel(nid) !== byLabel(qid), s"probe $qid got same-label neighbor $nid")
    }
    // exact reference: per probe, top-5 different-label by (cos desc, id)
    val probes = vecs.filter(_._1 < 10)
    probes.foreach { case (qid, qlabel, qv) =>
      val want = vecs
        .filter(v => v._1 != qid && v._2 != qlabel)
        .map(v => (v._1, cosine(v._3, qv)))
        .sortBy { case (id, sim) => (-sim, id) }
        .take(5).map(_._1)
      val got = rows.filter(_._1 == qid).sortBy(_._2).map(_._3).toSeq
      assert(got === want, s"probe $qid neighbor list diverges from brute force")
    }
  }

  test("e_maxsim: exact brute-force differential (sum-of-max in ppm)") {
    val rows = q("e_maxsim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = vecs.groupBy(_._1 / 5).view.mapValues(_.map(_._3)).toMap
    val qdocs = docs.keys.filter(_ < 2)
    qdocs.foreach { qd =>
      val want = docs.keys.filter(_ != qd).map { cd =>
        val score = docs(qd).map { qv =>
          docs(cd).map(cv => math.floor(cosine(cv, qv) * 1e6 + 0.5).toLong).max
        }.sum
        (cd, score)
      }.toSeq.sortBy { case (cd, s) => (-s, cd) }.take(3)
      val got = rows.filter(_._1 == qd).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(got === want, s"qdoc $qd maxsim ranking diverges from brute force")
    }
  }

  test("e_mmr_rerank: exact greedy-reference differential") {
    val rows = q("e_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def pp(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    vecs.filter(_._1 < 10).foreach { case (qid, _, qv) =>
      val cand = vecs.filter(_._1 != qid)
        .map(v => (v._1, pp(cosine(v._3, qv)), v._3))
        .sortBy { case (id, qs, _) => (-qs, id) }.take(20)
      val ps = (for (a <- cand; b <- cand if a._1 != b._1)
        yield ((a._1, b._1), pp(cosine(a._3, b._3)))).toMap
      val first = cand.sortBy { case (id, qs, _) => (-qs, id) }.head
      var sel = Vector((first._1, 7 * first._2))
      (2 to 4).foreach { _ =>
        val pick = cand.filter(c => !sel.exists(_._1 == c._1))
          .map { c =>
            val pen = sel.map(s => ps((c._1, s._1))).max
            (c._1, 7 * c._2 - 3 * pen)
          }.sortBy { case (id, x) => (-x, id) }.head
        sel :+= pick
      }
      val got = rows.filter(_._1 == qid).sortBy(_._2).map(r => (r._3, r._4)).toVector
      assert(got === sel, s"probe $qid MMR selection diverges from greedy reference")
    }
  }

  test("d_bpe_apply semantics: known merges, token-boundary safety, rank order") {
    import org.apache.spark.sql.functions.expr
    // evaluate the generated per-word chain directly on planted words
    def count(word: String): Long = {
      val cnt = PipelineQueries.bpeCountExprForTest
      spark.sql(s"SELECT transform(array('$word'), w -> $cnt) AS r")
        .head().getSeq[Long](0).head
    }
    assert(count("the") === 1L)      // t,h,e → th,e → the
    assert(count("thing") === 2L)    // t,h,i,n,g → th,i,n,g → th,in,g → th,ing
    assert(count("xyz") === 3L)      // no merges apply
    // (t,h) fires on BOTH halves (disjoint matches), but the two
    // resulting (th,e) occurrences share a token boundary — a single
    // non-overlapping pass merges only the first: the | th | e
    assert(count("thethe") === 3L)
    assert(count("ant") === 2L)      // a,n,t → an,t — and no (an,t) merge exists,
                                     // so the n+t character adjacency inside
                                     // separate tokens must NOT fuse
  }

  test("d_pack_bfd: strategy properties and the classic NF-beats case") {
    // classic: [1100, 1100, 900, 900] cap 2048 — next-fit in id order
    // needs 3 bins, best-fit-decreasing pairs 1100+900 twice
    val (nf, bfd) = PipelineQueries.packBins(
      Seq((0L, 1100L), (1L, 1100L), (2L, 900L), (3L, 900L)), 2048L)
    assert(nf === 3L && bfd === 2L)
    // oversized items get their own bin in both strategies
    val (nf2, bfd2) = PipelineQueries.packBins(Seq((0L, 5000L), (1L, 100L)), 2048L)
    assert(nf2 === 2L && bfd2 === 2L)
    val rows = q("d_pack_bfd").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), "lower <= BFD <= NF must hold on corpus data")
      assert(r.getBoolean(5), "NF must stay within its 2-approximation bound")
    }
  }

  test("d_span_mask: coverage invariants and target mask rate") {
    val rows = q("d_span_mask").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // n_tokens, n_starts, n_masked
    rows.foreach { case (n, st, m) =>
      assert(m >= st, "each span covers at least one token")
      assert(m <= 3 * st, "a span covers at most 3 tokens")
      assert(m <= n, "masking cannot exceed the document")
    }
    val totTok = rows.map(_._1).sum.toDouble
    val totMask = rows.map(_._3).sum.toDouble
    // 5% starts × span 3, minus merge/clip losses → expect ~0.13-0.14
    assert(totMask / totTok > 0.08 && totMask / totTok < 0.22,
      s"corpus mask rate ${totMask / totTok} outside the design band")
  }

  test("d_k_anonymity: audit invariants + independent class count") {
    val rows = q("d_k_anonymity").collect()
    val docs = Tables.documents(spark, TestSpark.SF)
    val classCount = docs
      .select(col("lang"), expr("n_chars DIV 100")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === classCount)
    rows.foreach { r =>
      val (nClasses, risky, riskyDocs, k, l) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(k >= 1 && l >= 1)
      assert(risky <= nClasses)
      assert(riskyDocs >= risky, "each risky class holds at least one doc")
      assert(riskyDocs <= risky * 4, "a risky class has at most 4 docs by definition")
      if (k >= 5) assert(risky === 0L)
    }
  }

  test("e_embed_drift: run-stable, dims in range, ordering sound") {
    val base = q("e_embed_drift").collect()
    assert(base.length === 10)
    val total = vecs.length.toLong
    base.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 64)   // dim
      assert(r.getLong(2) + r.getLong(3) === total)    // n_a + n_b
    }
    val drifts = base.sortBy(_.getLong(0)).map(_.getLong(5))
    assert(drifts.zip(drifts.tail).forall { case (a, b) => a >= b },
      "drift_x must be non-increasing in rank")
    // all-integer aggregation ⇒ identical across runs whatever split
    // the scan picks
    val again = q("e_embed_drift").collect()
    assert(base.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("q_bitmap_overlap: pair counts match exact distinct-set intersections") {
    val rows = q("q_bitmap_overlap").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val sets = Tables.events(spark, TestSpark.SF)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    for (i <- types.indices; j <- i + 1 until types.length) {
      val (t1, t2) = (types(i), types(j))
      val (nBoth, nA, nB) = rows((t1, t2))
      assert(nBoth === (sets(t1) intersect sets(t2)).size.toLong)
      assert(nA === sets(t1).size.toLong && nB === sets(t2).size.toLong)
    }
  }

  test("e_gram_matrix: exact quadratic reference over ppm-quantized vectors") {
    val got = q("e_gram_matrix").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ppm = vecs.map { case (_, _, v) =>
      v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    }
    val d = ppm.head.length
    assert(got.size === d * (d + 1) / 2, "upper triangle incomplete")
    for (i <- 0 until d; j <- i until d) {
      val want = ppm.iterator.map(e => e(i) * e(j)).sum
      assert(got((i.toLong, j.toLong)) === want, s"gram($i,$j)")
    }
  }

  /** The e_rand_proj hyperplane sign: bit 16 of Knuth multiplicative
    * hashing of the flattened (component, plane) index. */
  private def rpSign(i: Int, j: Int): Long =
    if ((((i * 8 + j + 1).toLong * 2654435761L) / 65536L) % 2 == 0) 1L else -1L

  test("e_rand_proj: exact per-row reference; sign table is not degenerate") {
    val got = q("e_rand_proj").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.size === vecs.size * 8)
    vecs.foreach { case (id, _, v) =>
      val e = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      for (j <- 0 until 8) {
        val want = e.indices.iterator.map(i => rpSign(i, j) * e(i)).sum
        assert(got((id, j.toLong)) === want, s"proj($id,$j)")
      }
    }
    // guard the hash choice: an LCG-mod-2 would alternate signs
    // perfectly (structured, correlated planes). Require both signs
    // well-represented AND no column constant.
    val table = for (i <- 0 until 64; j <- 0 until 8) yield (j, rpSign(i, j))
    val plus = table.count(_._2 == 1L)
    assert(plus > 150 && plus < 362, s"sign table skewed: $plus/512 positive")
    (0 until 8).foreach { j =>
      val colSigns = table.filter(_._1 == j).map(_._2).toSet
      assert(colSigns.size == 2, s"plane $j is a constant sign")
    }
  }

  test("e_kmeans: exact integer Lloyd reference (k=4, 2 rounds, offset floor-div update)") {
    val OFF = 4194304L
    val x: Map[Long, Array[Long]] = vecs.map { case (id, _, e) =>
      id -> e.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)
    }.toMap
    // every quantized component must clear the offset bound the update
    // rule relies on (numerator non-negativity ⇒ trunc-div == floor-div)
    x.values.foreach(e => e.foreach(v => assert(math.abs(v) < OFF)))
    def assign(cent: Map[Long, Array[Long]]): Map[Long, (Long, Long)] =
      x.map { case (id, e) =>
        val best = cent.toSeq.map { case (cid, c) =>
          var d = 0L; var i = 0
          while (i < e.length) { val t = e(i) - c(i); d += t * t; i += 1 }
          (d, cid)
        }.min // (dist, cid) lexicographic == min(struct(dist, cid))
        id -> (best._2, best._1)
      }
    var cent: Map[Long, Array[Long]] = x.filter(_._1 < 4)
    for (_ <- 1 to 2) {
      val a = assign(cent)
      cent = a.toSeq.groupBy(_._2._1).map { case (cid, members) =>
        val es = members.map(m => x(m._1))
        val n = es.size.toLong
        cid -> Array.tabulate(es.head.length) { d =>
          (es.iterator.map(_(d)).sum + n * OFF) / n - OFF
        }
      }
    }
    val want = assign(cent).toSeq
      .map { case (id, (cid, dist)) => (id, cid, dist) }.sorted
    val got = q("e_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === want)
    // the lane is vacuous if everything collapses into one cluster
    assert(want.map(_._2).distinct.size >= 2, "k-means degenerated to one cluster")
  }

  test("e_ivf_exact: in-memory IVF replay (cells, nprobe=2, exact rerank)") {
    val OFF = 4194304L
    val x: Map[Long, Array[Long]] = vecs.map { case (id, _, e) =>
      id -> e.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var d = 0L; var i = 0
      while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    def assign(cent: Map[Long, Array[Long]]): Map[Long, Long] =
      x.map { case (id, e) =>
        id -> cent.toSeq.map { case (cid, c) => (d2(e, c), cid) }.min._2
      }
    var cent: Map[Long, Array[Long]] = x.filter(_._1 < 4)
    for (_ <- 1 to 2) {
      val a = assign(cent)
      cent = a.toSeq.groupBy(_._2).map { case (cid, members) =>
        val es = members.map(m => x(m._1))
        val n = es.size.toLong
        cid -> Array.tabulate(es.head.length) { d =>
          (es.iterator.map(_(d)).sum + n * OFF) / n - OFF
        }
      }
    }
    val cells = assign(cent)
    val want = x.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      val probeCells = cent.toSeq
        .map { case (cid, c) => (d2(x(qid), c), cid) }.sorted.take(2).map(_._2).toSet
      x.toSeq
        .filter { case (id, _) => id != qid && probeCells(cells(id)) }
        .map { case (id, e) => (d2(x(qid), e), id) }.sorted.take(5)
        .zipWithIndex
        .map { case ((dist, id), i) => (qid, (i + 1).toLong, id, dist) }
    }
    val got = q("e_ivf_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // cell pruning must actually prune on the fixture: at least one
    // probe's IVF top-5 differs from the unpruned brute-force top-5,
    // otherwise the lane silently degenerates into e_ann_l2
    val bruteDiffers = x.keys.filter(_ < 10).exists { qid =>
      val brute = x.toSeq.filter(_._1 != qid)
        .map { case (id, e) => (d2(x(qid), e), id) }.sorted.take(5).map(_._2)
      val ivf = want.filter(_._1 == qid).sortBy(_._2).map(_._3)
      brute != ivf
    }
    assert(bruteDiffers, "nprobe=2 visited every informative cell — lane is vacuous")
  }

  private def ppmOf(e: Array[Float]): Array[Long] =
    e.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong)

  private def sqDist(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  test("e_lsh_exact: in-memory multiprobe LSH replay (4-plane buckets, exact rerank)") {
    val x = vecs.map { case (id, _, e) => id -> ppmOf(e) }.toMap
    // bucket = sign pattern of the first 4 e_rand_proj planes
    def sig(e: Array[Long]): Long =
      (0 until 4).map { j =>
        val p = e.indices.iterator.map(i => rpSign(i, j) * e(i)).sum
        if (p >= 0) 1L << j else 0L
      }.sum
    val sigs = x.map { case (id, e) => id -> sig(e) }
    val want = x.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      val visit = Seq(0L, 1L, 2L, 4L, 8L).map(_ ^ sigs(qid)).toSet
      x.toSeq
        .filter { case (id, _) => id != qid && visit(sigs(id)) }
        .map { case (id, e) => (sqDist(x(qid), e), id) }.sorted.take(5)
        .zipWithIndex
        .map { case ((dist, id), i) => (qid, (i + 1).toLong, id, dist) }
    }
    val got = q("e_lsh_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // buckets must actually prune: some probe's candidate set is a
    // strict subset of the corpus
    assert(sigs.values.toSet.size >= 3, "every vector landed in one LSH bucket")
  }

  test("e_sq8_exact: quantize/reconstruct/ADC replay; quantization is lossy") {
    val x = vecs.map { case (id, _, e) => id -> ppmOf(e) }.toMap
    val dims = x.values.head.length
    val mn = Array.tabulate(dims)(d => x.values.map(_(d)).min)
    val mx = Array.tabulate(dims)(d => x.values.map(_(d)).max)
    def recon(e: Array[Long]): Array[Long] =
      Array.tabulate(dims) { d =>
        val code = if (mx(d) > mn(d)) (e(d) - mn(d)) * 255 / (mx(d) - mn(d)) else 0L
        mn(d) + code * (mx(d) - mn(d)) / 255
      }
    val rec = x.map { case (id, e) => id -> recon(e) }
    val want = x.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      x.keys.filter(_ != qid).toSeq
        .map(id => (sqDist(x(qid), rec(id)), id)).sorted.take(5)
        .zipWithIndex
        .map { case ((dist, id), i) => (qid, (i + 1).toLong, id, dist) }
    }
    val got = q("e_sq8_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    assert(x.exists { case (id, e) => !e.sameElements(rec(id)) },
      "SQ8 reconstruction is lossless on the fixture — lane is vacuous")
  }

  test("e_semdedup_exact: cells + dominance keep-rule replay; finds and keeps both") {
    val OFF = 4194304L
    val x = vecs.map { case (id, _, e) => id -> ppmOf(e) }.toMap
    def assign(cent: Map[Long, Array[Long]]): Map[Long, Long] =
      x.map { case (id, e) =>
        id -> cent.toSeq.map { case (cid, c) => (sqDist(e, c), cid) }.min._2
      }
    var cent: Map[Long, Array[Long]] = x.filter(_._1 < 4)
    for (_ <- 1 to 2) {
      val a = assign(cent)
      cent = a.toSeq.groupBy(_._2).map { case (cid, members) =>
        val es = members.map(m => x(m._1))
        val n = es.size.toLong
        cid -> Array.tabulate(es.head.length) { d =>
          (es.iterator.map(_(d)).sum + n * OFF) / n - OFF
        }
      }
    }
    val cells = assign(cent)
    val want = x.keys.toSeq.sorted.map { id =>
      val doms = x.keys.filter(o => o < id && cells(o) == cells(id) &&
        sqDist(x(o), x(id)) <= 1200000000000L)
      (id, if (doms.isEmpty) -1L else doms.min)
    }
    val got = q("e_semdedup_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(got === want)
    assert(want.exists(_._2 >= 0L), "no duplicates found — threshold too tight")
    assert(want.exists(_._2 == -1L), "everything deduplicated — threshold too loose")
  }

  test("e_pq_exact: in-memory PQ replay (4 subspace codebooks, ADC lookup)") {
    val OFF = 4194304L
    val x = vecs.map { case (id, _, e) => id -> ppmOf(e) }.toMap
    def lloydRef(xs: Map[Long, Array[Long]]): Map[Long, Array[Long]] = {
      def assign(cent: Map[Long, Array[Long]]): Map[Long, Long] =
        xs.map { case (id, e) =>
          id -> cent.toSeq.map { case (cid, c) => (sqDist(e, c), cid) }.min._2
        }
      var cent: Map[Long, Array[Long]] = xs.filter(_._1 < 4)
      for (_ <- 1 to 2) {
        val a = assign(cent)
        cent = a.toSeq.groupBy(_._2).map { case (cid, members) =>
          val es = members.map(m => xs(m._1))
          val n = es.size.toLong
          cid -> Array.tabulate(es.head.length) { d =>
            (es.iterator.map(_(d)).sum + n * OFF) / n - OFF
          }
        }
      }
      cent
    }
    // per-subspace: codebook, per-vector code, probe lookup tables
    val subs = (0 until 4).map { m =>
      val xs = x.map { case (id, e) => id -> e.slice(m * 16, (m + 1) * 16) }
      val cent = lloydRef(xs)
      val code = xs.map { case (id, e) =>
        id -> cent.toSeq.map { case (cid, c) => (sqDist(e, c), cid) }.min._2
      }
      (xs, cent, code)
    }
    val want = x.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      x.keys.filter(_ != qid).toSeq
        .map { id =>
          val adc = subs.iterator.map { case (xs, cent, code) =>
            sqDist(xs(qid), cent(code(id)))
          }.sum
          (adc, id)
        }.sorted.take(5)
        .zipWithIndex
        .map { case ((dist, id), i) => (qid, (i + 1).toLong, id, dist) }
    }
    val got = q("e_pq_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // ADC must actually quantize: for some probe the PQ top-5 differs
    // from exact brute force, else the lane degenerates into e_ann_l2
    val differs = x.keys.filter(_ < 10).exists { qid =>
      val brute = x.toSeq.filter(_._1 != qid)
        .map { case (id, e) => (sqDist(x(qid), e), id) }.sorted.take(5).map(_._2)
      brute != want.filter(_._1 == qid).sortBy(_._2).map(_._3)
    }
    assert(differs, "PQ ADC ranking equals exact ranking on every probe — vacuous")
  }

  /** Exact integer Lloyd (k=4, 2 rounds, offset floor-div update) —
    * the in-memory reference shared by the IVF/PQ replay tests. */
  private def lloydRef(xs: Map[Long, Array[Long]]): Map[Long, Array[Long]] = {
    val OFF = 4194304L
    def assign(cent: Map[Long, Array[Long]]): Map[Long, Long] =
      xs.map { case (id, e) =>
        id -> cent.toSeq.map { case (cid, c) => (sqDist(e, c), cid) }.min._2
      }
    var cent: Map[Long, Array[Long]] = xs.filter(_._1 < 4)
    for (_ <- 1 to 2) {
      val a = assign(cent)
      cent = a.toSeq.groupBy(_._2).map { case (cid, members) =>
        val es = members.map(m => xs(m._1))
        val n = es.size.toLong
        cid -> Array.tabulate(es.head.length) { d =>
          (es.iterator.map(_(d)).sum + n * OFF) / n - OFF
        }
      }
    }
    cent
  }

  test("e_ivfpq_exact: in-memory IVFADC replay (cells, residual PQ, per-cell tables)") {
    val x = vecs.map { case (id, _, e) => id -> ppmOf(e) }.toMap
    val cent = lloydRef(x)
    def nearest(e: Array[Long]): Long =
      cent.toSeq.map { case (cid, c) => (sqDist(e, c), cid) }.min._2
    val cells = x.map { case (id, e) => id -> nearest(e) }
    val resid = x.map { case (id, e) =>
      id -> e.indices.map(d => e(d) - cent(cells(id))(d)).toArray
    }
    val subs = (0 until 4).map { m =>
      val xs = resid.map { case (id, r) => id -> r.slice(m * 16, (m + 1) * 16) }
      val cb = lloydRef(xs)
      val code = xs.map { case (id, r) =>
        id -> cb.toSeq.map { case (cid, c) => (sqDist(r, c), cid) }.min._2
      }
      (cb, code)
    }
    val want = x.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      val visited = cent.toSeq
        .map { case (cid, c) => (sqDist(x(qid), c), cid) }.sorted.take(2).map(_._2)
      visited.flatMap { cell =>
        val rq = x(qid).indices.map(d => x(qid)(d) - cent(cell)(d)).toArray
        x.keys.filter(v => v != qid && cells(v) == cell).map { v =>
          val adc = subs.zipWithIndex.iterator.map { case ((cb, code), m) =>
            sqDist(rq.slice(m * 16, (m + 1) * 16), cb(code(v)))
          }.sum
          (adc, v)
        }
      }.sorted.take(5).zipWithIndex
        .map { case ((dist, id), i) => (qid, (i + 1).toLong, id, dist) }
    }
    val got = q("e_ivfpq_exact").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // residual encoding must matter: for some probe the IVFADC top-5
    // differs from the plain-PQ top-5 (shared fixture, so compare to
    // brute force as the common yardstick)
    val differs = x.keys.filter(_ < 10).exists { qid =>
      val brute = x.toSeq.filter(_._1 != qid)
        .map { case (id, e) => (sqDist(x(qid), e), id) }.sorted.take(5).map(_._2)
      brute != want.filter(_._1 == qid).sortBy(_._2).map(_._3)
    }
    assert(differs, "IVFADC ranking equals exact ranking on every probe — vacuous")
  }

  test("d_bpe_train: the string-replace merge equals the canonical " +
      "list-based single-pass BPE on the real corpus") {
    // in-memory reference: word types with freq, k rounds of
    // (count adjacent pairs → argmax (n DESC, pair ASC) → single
    // left-to-right list merge) — written with Vector surgery, no
    // string tricks, so it is INDEPENDENT of the lane's replace-based
    // re-tokenization
    val words: Map[String, Long] =
      Tables.documents(spark, TestSpark.SF)
        .select(col("text")).collect()
        .flatMap(_.getString(0).split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    var toks: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val want = (1 to graft.operators.CurationQueries.BpeTrainRounds).map { r =>
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      for ((w, t) <- toks; i <- 0 until t.length - 1)
        counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + words(w)
      val (pa, pb) = counts.keys.toSeq
        .sortBy { case (a, b) => (-counts((a, b)), a, b) }.head
      val n = counts((pa, pb))
      toks = toks.map { case (w, t) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < t.length) {
          if (i + 1 < t.length && t(i) == pa && t(i + 1) == pb) {
            out += (pa + pb); i += 2
          } else { out += t(i); i += 1 }
        }
        w -> out.result()
      }
      val nTokens = toks.map { case (w, t) => words(w) * t.length }.sum
      val vocab = toks.values.flatten.toSet.size.toLong
      (r.toLong, pa, pb, n, nTokens, vocab)
    }
    val got = q("d_bpe_train").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
    // non-vacuous feedback: on a corpus dominated by 'aaaa' the second
    // round MUST merge the token born in the first ((aa, a) or
    // (aa, aa)) — re-tokenization feeding back into mining. (The sf
    // fixture's first 6 merges happen to stay single-char at sf0.001,
    // so the feedback property is pinned on a synthetic corpus; the
    // sf0.01 driver run shows it on real data — round 6 merges m+er.)
    val synth = Seq.fill(50)("aaaa bc").mkString(" ")
    val sdf = spark.createDataFrame(Seq((0L, synth))).toDF("doc_id", "text")
    val rounds = graft.operators.CurationQueries.bpeTrain(spark, sdf, 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(rounds(0) === ("a", "a"))
    assert(rounds(1)._1.length > 1, s"round 2 merged ${rounds(1)} — no feedback")
  }
}
