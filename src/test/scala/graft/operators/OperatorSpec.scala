package graft.operators

import graft.{TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality properties of the dedup/similarity operators: the LSH paths
  * must (on the fixture corpus) recover what the exact quadratic paths
  * find.
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.SF)

  test("minhash LSH finds planted near-duplicates and nothing else") {
    // Plant near-dup pairs: copies of fixture docs with a few words
    // changed. Fixture docs themselves share no word order (random
    // sequences), so shingle-Jaccard between distinct docs ≈ 0.
    val base = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).take(100)
    val mutated = base.take(20).map { case (id, text) =>
      val words = text.trim.split("\\s+")
      val changed = words.updated(words.length / 2, "MUTANT").mkString(" ")
      (id + 100000L, changed)
    }
    val corpus = spark.createDataFrame(
      (base ++ mutated).toSeq).toDF("doc_id", "text")

    val lshRows = Dedup.minhashDedup(corpus, "doc_id", "text",
        numHashes = 128, bands = 32, threshold = 0.5)
      .collect()
    val lsh = lshRows.map(r => (r.getLong(0), r.getLong(1))).toSet

    // every planted pair recovered (recall = 1)…
    val expected = mutated.map { case (mid, _) => (mid - 100000L, mid) }.toSet
    assert(expected.subsetOf(lsh), s"missed planted pairs: ${expected -- lsh}")
    // …and everything returned passed exact verification (the fixture
    // corpus contains a few genuine near-dup pairs of its own, so extras
    // beyond the planted set are legitimate)
    lshRows.foreach(r => assert(r.getDouble(2) >= 0.5))
  }

  test("weighted minhash: slot-match rate tracks weighted Jaccard; signature is permutation-invariant") {
    import graft.functions.{VariantFunctions => vf}
    val k = 512
    // multisets {a×2, b×1} vs {a×1, b×1}: wJ = (1+1)/(2+1) = 2/3
    val rows = Seq(
      (1L, Seq("a", "a", "b")),
      (2L, Seq("a", "b")),
      (3L, Seq("b", "a", "a"))) // permutation of id 1
      .toDF("id", "toks")
    val sigs = rows.select(col("id"), vf.weighted_minhash_signature(col("toks"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(3L), "signature must be permutation-invariant")
    val matches = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }
    val rate = matches.toDouble / k
    assert(math.abs(rate - 2.0 / 3.0) < 0.08, s"slot-match rate $rate != ~0.667")
  }

  test("weighted minhash LSH recovers boilerplate-heavy planted near-dups with exact ppm verification") {
    // Docs dominated by a shared boilerplate vocabulary with repeated
    // tokens: the weighted form keeps their similarity visible.
    val vocab = (1 to 200).map(i => s"tok$i")
    def doc(seed: Int): Seq[String] = {
      val r = new scala.util.Random(seed)
      (1 to 120).map(_ => vocab(r.nextInt(vocab.size)))
    }
    val base = (1 to 30).map(i => (i.toLong, doc(i).mkString(" ")))
    val mutated = base.take(8).map { case (id, text) =>
      val words = text.split(" ")
      // change ~10% of positions → wJ ≈ 0.8
      val changed = words.zipWithIndex.map { case (w, ix) =>
        if (ix % 10 == 0) "MUTANT" + ix else w
      }.mkString(" ")
      (id + 1000L, changed)
    }
    val corpus = spark.createDataFrame((base ++ mutated)).toDF("doc_id", "text")
    val got = Dedup.weightedMinhashDedup(corpus, "doc_id", "text",
        thresholdPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = mutated.map { case (mid, _) => (mid - 1000L, mid) }.toSet
    val recall = (expected & got).size.toDouble / expected.size
    assert(recall >= 0.8, s"planted recall $recall; missed ${expected -- got}")
    // precision by construction: every returned pair passed exact wJ >= 0.5
    val verified = Dedup.weightedMinhashDedup(corpus, "doc_id", "text",
      thresholdPpm = 500000L).collect()
    verified.foreach(r => assert(r.getLong(2) >= 500000L))
  }

  test("minhash candidate generation does not explode on degenerate vocab (shingles keep buckets sparse)") {
    // 200 docs over a tiny vocabulary: unigram sets are all identical,
    // but shingle sets are distinct → candidate count stays near zero.
    val vocab = Array("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until 40).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val corpus = spark.createDataFrame(rows).toDF("doc_id", "text")
    val n = Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.8).count()
    assert(n < 20, s"degenerate corpus produced $n candidate pairs")
  }

  test("simhash of near-identical token lists has small hamming distance") {
    val r = spark.sql(
      """SELECT bit_count(simhash64(array('a','b','c','d','e','f','g','h')) ^
        |                 simhash64(array('a','b','c','d','e','f','g','x'))) AS near,
        |       bit_count(simhash64(array('a','b','c','d','e','f','g','h')) ^
        |                 simhash64(array('p','q','r','s','t','u','v','w'))) AS far
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) < r.getInt(1))
  }

  test("brute-force ANN: a vector's nearest neighbor by construction ranks first") {
    // plant a near-duplicate of vec 0 and check it comes back at rank 1
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val planted = v0.updated(0, v0.head + 0.001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((99999L, planted)).toDF("vec_id", "embedding"))
    val probes = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.bruteForceTopK(corpus, probes, 1).collect()(0)
    assert(top.getAs[Long]("neighbor_id") == 99999L)
  }

  test("hyperplane LSH ANN finds a planted near-duplicate (multiprobe)") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val planted = v0.map(x => x * 1.0001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((99999L, planted)).toDF("vec_id", "embedding"))
    val probes = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.lshTopK(corpus, probes, 1, bits = 8).collect()
    assert(top.nonEmpty && top(0).getAs[Long]("neighbor_id") == 99999L)
  }

  test("IVF k-means ANN finds a planted near-duplicate") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val planted = v0.map(x => x * 1.0001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((99999L, planted)).toDF("vec_id", "embedding"))
    val probes = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.ivfTopK(corpus, probes, 1).collect()
    assert(top.nonEmpty && top(0).getAs[Long]("neighbor_id") == 99999L)
  }

  test("PQ ANN finds a planted near-duplicate; ADC ranking agrees with exact on top-1") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val planted = v0.map(x => x * 1.0001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((99999L, planted)).toDF("vec_id", "embedding"))
    val probes = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.pqTopK(corpus, probes, 1).collect()
    assert(top.nonEmpty && top(0).getAs[Long]("neighbor_id") == 99999L)
  }

  test("SQ8 ANN finds a planted near-duplicate; quantized kernel matches float on identical codes") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val planted = v0.map(x => x * 1.0001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((99999L, planted)).toDF("vec_id", "embedding"))
    val probes = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.sq8TopK(corpus, probes, 1).collect()
    assert(top.nonEmpty && top(0).getAs[Long]("neighbor_id") == 99999L)
    // kernel sanity: identical vectors → identical codes → cosine 1.0;
    // the zero vector quantizes to all-zero codes → NULL (like float)
    val r = spark.sql(
      """SELECT vec_cosine_i8(vec_sq8(array(0.5F, -1.0F, 0.25F)),
        |                     vec_sq8(array(0.5F, -1.0F, 0.25F))) AS same,
        |       vec_cosine_i8(vec_sq8(array(0.0F, 0.0F)),
        |                     vec_sq8(array(1.0F, 2.0F))) AS zero,
        |       length(vec_sq8(array(0.5F, -1.0F, 0.25F))) AS len
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.isNullAt(1))
    assert(r.getInt(2) == 3)
  }

  test("semantic dedup removes a planted duplicate and keeps distinct vectors") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    // exact copy of vec 0 → lands in the same k-means cell → cosine 1.0
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((99999L, v0)).toDF("vec_id", "embedding"))
    val removed = Similarity.semanticDedup(corpus, nClusters = 8, thr = 0.95)
      .as[Long].collect().toSet
    assert(removed.contains(99999L), "planted duplicate survived semantic dedup")
    // a removal implies an in-cell near-dup partner with a smaller id;
    // vec 0 (the pair's lower id, the kept representative) must survive
    assert(!removed.contains(0L), "kept representative was removed")
  }

  test("PQ recall@5 over real probes stays high (rerank pool absorbs quantization error)") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 5))
    val approx = pairs(Similarity.pqTopK(emb, probes, 5))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall@5 = $recall")
  }

  test("IVF+PQ composite recall@5: cell pruning plus code scoring stays above the IVF floor") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 5))
    val composite = pairs(Similarity.ivfPqTopK(emb, probes, 5))
    val ivfOnly = pairs(Similarity.ivfTopK(emb, probes, 5))
    val recall = (exact & composite).size.toDouble / exact.size
    // the composite can only lose candidates PQ misranks past the
    // rerank pool; with rerank=8 it should track the IVF-exact recall
    val ivfRecall = (exact & ivfOnly).size.toDouble / exact.size
    assert(recall >= ivfRecall - 0.1,
      s"IVF+PQ recall $recall fell >0.1 below IVF-exact $ivfRecall")
    assert(recall >= 0.3, s"IVF+PQ recall@5 = $recall")
  }

  test("winnowing: shared text runs guarantee shared fingerprints; disjoint texts share none") {
    val sql1 = spark.sql(
      """SELECT winnow_fingerprints('The quick brown fox jumps over the lazy dog near the river bank today') AS a""")
      .collect()(0).getSeq[Long](0).toSet
    // same long run embedded in different surroundings
    val sql2 = spark.sql(
      """SELECT winnow_fingerprints('PREFIX text here -- quick brown fox jumps over the lazy dog -- SUFFIX') AS a""")
      .collect()(0).getSeq[Long](0).toSet
    assert((sql1 & sql2).nonEmpty, "shared 40-char run produced no shared fingerprint")
    val sql3 = spark.sql(
      """SELECT winnow_fingerprints('zebra xylophone quartz vex jumbo whiskey golf hotel india kilo lima') AS a""")
      .collect()(0).getSeq[Long](0).toSet
    assert((sql1 & sql3).isEmpty, "disjoint texts share fingerprints")
    // determinism
    val again = spark.sql(
      """SELECT winnow_fingerprints('The quick brown fox jumps over the lazy dog near the river bank today') AS a""")
      .collect()(0).getSeq[Long](0).toSet
    assert(again == sql1)
  }

  test("asofJoin: most recent right row at or before each left row; null when none") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq(
      (1L, 10L, ts(100)), // after r@50 → matches 50
      (2L, 10L, ts(300)), // after r@250 → matches 250
      (3L, 20L, ts(100)), // key 20 has right only at 200 → null
      (4L, 20L, ts(200))  // equality included → matches 200
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts(50)),
      (102L, 10L, ts(250)),
      (103L, 20L, ts(200))
    ).toDF("event_id", "user_id", "ts")
    val out = Joins.asofJoin(left, right, "user_id", "ts", "ts",
        Map("event_id" -> "click_id"))
      .select("event_id", "click_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> 101L, 2L -> 102L, 3L -> null, 4L -> 103L))
  }

  test("rangeJoinPairs: exactly the pairs within the window, each once (incl. cell-boundary pairs)") {
    import java.sql.Timestamp
    def ts(us: Long) = new Timestamp(us / 1000) // ms precision is enough here
    val w = 60L * 1000000L
    val ev = Seq(
      (10L, ts(0L)),
      (10L, ts(59L * 1000000L)),  // same cell as 0 → pair (0, 59s)
      (10L, ts(61L * 1000000L)),  // next cell; 59→61 within 60s (boundary cross)
      (10L, ts(200L * 1000000L)), // isolated
      (20L, ts(30L * 1000000L))   // other key
    ).toDF("user_id", "ts")
    val pairs = Joins.rangeJoinPairs(ev, "user_id", "ts", w)
      .select("user_id", "ts_a", "ts_b")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000))
      .toSet
    assert(pairs == Set((10L, 0L, 59L), (10L, 59L, 61L)), pairs)
    // no duplicates: count equals set size
    assert(Joins.rangeJoinPairs(ev, "user_id", "ts", w).count() == 2)
  }

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = df.groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("dup clusters: every near-dup pair shares a label; label is the component minimum") {
    val clusters = graft.Queries.queryMap("d_dup_clusters")(spark, TestSpark.SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = TextQueries.exactJaccardPairs(spark, TestSpark.SF)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // connectivity: both endpoints of every edge carry the same label
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // minimality: the label is a member of its own cluster and is the min
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keySet.min == label,
        s"cluster $label: min member ${members.keySet.min}")
    }
  }

  test("misra-gries: heavy items always survive the sketch; two-pass output is partition-invariant") {
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.MisraGries
    // skew: h0..h5 with geometric frequencies over 5000 distinct noise items
    val data = (0 until 6).flatMap(i => Seq.fill(1 << (10 - i))(s"h$i")) ++
      (0 until 5000).map(i => s"noise$i")
    val n = data.length.toLong
    val k = 15
    def candidates(parts: Int): Set[String] = {
      val df = spark.sparkContext.parallelize(data, parts).toDF("term")
      df.agg(Bridge.column(MisraGries(Bridge.expression(col("term")), k)
          .toAggregateExpression()).as("c"))
        .collect()(0).getSeq[String](0).toSet
    }
    val exact = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val guaranteed = exact.filter(_._2 > n / (k + 1)).keySet
    assert(guaranteed.nonEmpty)
    def twoPass(parts: Int): Seq[(String, Long)] = {
      val c = candidates(parts)
      assert(guaranteed.subsetOf(c), s"parts=$parts lost ${guaranteed -- c}")
      assert(c.size <= k)
      val df = spark.sparkContext.parallelize(data, parts).toDF("term")
      df.filter(col("term").isin(c.toSeq: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > n.toDouble / (k + 1))
        .orderBy(col("cnt").desc, col("term"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val ref = twoPass(1)
    assert(ref.toMap == exact.filter(_._2 > n.toDouble / (k + 1)))
    assert(twoPass(13) == ref) // candidates may differ; verified output may not
  }

  test("multimodal feature extraction: entropy/moments are real and deterministic") {
    val uniform = Multimodal.extractFeatures(1L, Array.tabulate[Byte](256)(_.toByte))
    assert(math.abs(uniform.entropy - 8.0) < 1e-9) // 256 distinct bytes = 8 bits
    assert(uniform.distinct_bytes == 256)
    val constant = Multimodal.extractFeatures(2L, Array.fill[Byte](100)(65))
    assert(constant.entropy == 0.0 && constant.distinct_bytes == 1 && constant.mean_byte == 65.0)
    assert(constant.byte_sum == 6500L && constant.n_bytes == 100L)
    assert(uniform.byte_sum == (0 until 256).sum.toLong && uniform.histogram_top == 0)
  }

  test("multimodal resize preserves aspect ratio; frame sampling covers the blob") {
    val meta = Multimodal.BlobMeta(1L, 1000L, 512L, 256L, "png")
    val rs = Multimodal.resizeMeta(meta, maxDim = 128L)
    assert(rs.dst_w == 128L && rs.dst_h == 64L && rs.scale == 0.25)
    val fs = Multimodal.sampleFrames(1L, new Array[Byte](1000), frameSize = 64, every = 4)
    assert(fs.n_frames == 16 && fs.sampled.length == 4)
    assert(fs.sampled.head.length == 64)
  }

  test("multimodal stub decode emits typed metadata per blob") {
    val out = Multimodal.blobMeta(spark, docs.limit(5)).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[Long]("width") >= 64 && r.getAs[Long]("width") < 576)
      assert(Set("png", "jpeg", "webp").contains(r.getAs[String]("fmt")))
    }
  }

  test("repeated-ngram coverage ≡ brute-force interval union on random corpora") {
    // The gaps-and-islands running-max window in d_repeated_ngram_strip
    // must equal the operational definition: mark every token index
    // covered by ANY repeated 8-gram's [p, p+7] span, count marks.
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val docsFix = (0L until 40L).map { id =>
      // tiny vocab forces heavy shingle collisions; varying lengths hit
      // the n<8 edge and single-island/multi-island shapes
      val n = 3 + rnd.nextInt(40)
      (id, (0 until n).map(_ => "w" + rnd.nextInt(6)).mkString(" "))
    }
    val df = docsFix.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_fix_").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.Queries.queryMap("d_repeated_ngram_strip")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the production 64-bit-hashed gram key must agree with the exact
    // string-keyed formulation (collision-free on any real corpus)
    val viaStrings = TextQueries.repeatedNgramStrip(spark, dir, hashKey = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === viaStrings, "hash-keyed and string-keyed strip disagree")
    // brute force over the SAME fixture
    val toks = docsFix.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty) }.toMap
    val counts = scala.collection.mutable.Map.empty[String, Int]
    toks.values.foreach { w =>
      (0 to w.length - 8).foreach { i => val g = w.slice(i, i + 8).mkString(" ")
        counts(g) = counts.getOrElse(g, 0) + 1 }
    }
    toks.foreach { case (id, w) =>
      val marks = new Array[Boolean](w.length)
      var nRep = 0L
      (0 to w.length - 8).foreach { i =>
        if (counts(w.slice(i, i + 8).mkString(" ")) >= 2) {
          nRep += 1; (i until i + 8).foreach(marks(_) = true)
        }
      }
      val covered = marks.count(identity).toLong
      assert(got(id) === ((w.length.toLong, nRep, covered, w.length - covered)),
        s"doc $id: got ${got(id)}, want (${w.length}, $nRep, $covered, ${w.length - covered})")
    }
  }

  test("BMP codec: encode→decode roundtrip exact, stride/bottom-up honored, malformed rejected") {
    // widths 1-5 sweep every stride-padding residue (w*3 mod 4)
    for (w <- 1 to 5; h <- Seq(1, 2, 3)) {
      def px(x: Int, y: Int): Int = ((x * 31 + y * 7) % 256) * 0x010101 + x + (y << 16)
      val img = Multimodal.decodeBmp24(Multimodal.encodeBmp24(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == (px(x, y) & 0xffffff), s"($x,$y) in ${w}x$h")
    }
    // top-down recovery: top-left pixel is stored in the LAST file row
    val enc = Multimodal.encodeBmp24(2, 2, (x, y) => if (x == 0 && y == 0) 0xff0000 else 0)
    assert(Multimodal.decodeBmp24(enc).pixels(0) == 0xff0000)
    // malformed inputs throw, never misparse
    intercept[IllegalArgumentException](Multimodal.decodeBmp24(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException] {
      val bad = enc.clone(); bad(28) = 8 // 8bpp palette — unsupported
      Multimodal.decodeBmp24(bad)
    }
    intercept[IllegalArgumentException](
      Multimodal.decodeBmp24(java.util.Arrays.copyOf(enc, enc.length - 4)))
  }

  test("WAV codec: PCM16 roundtrip exact through a junk LIST chunk; malformed rejected") {
    val samples = Array.tabulate(777)(i => ((i * 2731) % 65536 - 32768).toShort)
    val wav = Multimodal.decodeWav(Multimodal.encodeWavPcm16(22050, samples))
    assert(wav.sampleRate == 22050 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == samples.toSeq)
    // extreme values survive the unsigned/LE round-trip
    val edges = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    assert(Multimodal.decodeWav(Multimodal.encodeWavPcm16(8000, edges)).samples.toSeq == edges.toSeq)
    // zero-sample stream: valid container, empty data chunk
    assert(Multimodal.decodeWav(Multimodal.encodeWavPcm16(8000, Array.empty[Short]))
      .samples.isEmpty)
    intercept[IllegalArgumentException](Multimodal.decodeWav("not a wav".getBytes))
    intercept[IllegalArgumentException] {
      val enc = Multimodal.encodeWavPcm16(8000, edges)
      enc(20) = 3 // IEEE-float format tag — unsupported
      Multimodal.decodeWav(enc)
    }
    // hostile chunk size (negative u32) throws instead of stalling the walk
    intercept[IllegalArgumentException] {
      val enc = Multimodal.encodeWavPcm16(8000, edges)
      enc(16) = 0xf8.toByte; enc(17) = 0xff.toByte
      enc(18) = 0xff.toByte; enc(19) = 0xff.toByte // fmt size = -8
      Multimodal.decodeWav(enc)
    }
  }

  test("PNG codec: roundtrip exact across all five filters; CRC and malformed inputs rejected") {
    // every (w, h) with h ≥ 5 exercises filters None/Sub/Up/Average/Paeth
    for (w <- Seq(1, 2, 3, 7, 16); h <- Seq(5, 6, 9)) {
      def px(x: Int, y: Int): Int =
        (((x * 31 + y * 7) % 256) << 16) | (((x * 5 + y * 11 + 3) % 256) << 8) |
          ((x * 13 + y * 17 + 100) % 256)
      val img = Multimodal.decodePng(Multimodal.encodePngRgb(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == px(x, y), s"($x,$y) in ${w}x$h")
    }
    // short images (not all filters present) still round-trip
    val one = Multimodal.decodePng(Multimodal.encodePngRgb(1, 1, (_, _) => 0xabcdef))
    assert(one.pixels.toSeq == Seq(0xabcdef))
    // a large-ish image forces the two-IDAT split path
    val big = Multimodal.decodePng(
      Multimodal.encodePngRgb(64, 64, (x, y) => (x ^ y) * 0x010101))
    assert(big.pixels(63 * 64 + 21) == ((21 ^ 63) * 0x010101))
    // malformed inputs throw, never misparse
    val enc = Multimodal.encodePngRgb(4, 5, (x, y) => x + y)
    intercept[IllegalArgumentException](Multimodal.decodePng("not a png".getBytes))
    intercept[IllegalArgumentException] { // corrupted IDAT tail byte → CRC mismatch
      val bad = enc.clone(); bad(bad.length - 15) = (bad(bad.length - 15) ^ 0x40).toByte
      Multimodal.decodePng(bad)
    }
    intercept[IllegalArgumentException] { // truncated file
      Multimodal.decodePng(java.util.Arrays.copyOf(enc, enc.length - 6))
    }
    intercept[IllegalArgumentException] { // grayscale colour type — unsupported
      val bad = enc.clone(); bad(8 + 8 + 9) = 0
      // fix the IHDR CRC so the colour-type check (not CRC) is what fires
      val crc = new java.util.zip.CRC32(); crc.update(bad, 12, 4 + 13)
      val v = crc.getValue.toInt
      bad(29) = (v >>> 24).toByte; bad(30) = (v >>> 16).toByte
      bad(31) = (v >>> 8).toByte; bad(32) = v.toByte
      Multimodal.decodePng(bad)
    }
  }

  test("JPEG codec: block-constant gray exact; arbitrary RGB within error envelope; malformed rejected") {
    // 1. block-constant gray is BIT-EXACT (the mm_jpeg_decode contract):
    //    constant blocks have dyadic-exact DC and zero AC under all-ones
    //    quant tables; gray is a fixed point of the YCbCr transform
    for (bw <- 1 to 4; bh <- 1 to 3) {
      val (w, h) = (8 * bw, 8 * bh)
      def px(x: Int, y: Int): Int = {
        val g = ((x / 8) * 37 + (y / 8) * 59 + 11) % 256
        (g << 16) | (g << 8) | g
      }
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpegRgb(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == px(x, y), s"($x,$y) in ${w}x$h")
    }
    // 2. arbitrary RGB (incl. non-multiple-of-8 dims → edge replication):
    //    per-channel error ≤ 12 (≤0.5/quantized coefficient through the
    //    IDCT ≤ ~7.5, plus ±2 color-transform rounding)
    for ((w, h) <- Seq((13, 10), (17, 12), (8, 8), (1, 1), (64, 64))) {
      def px(x: Int, y: Int): Int =
        (((x * 7 + y * 13) % 256) << 16) | (((x * 11 + y * 5) % 256) << 8) |
          ((x * 3 + y * 17) % 256)
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpegRgb(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w; sh <- Seq(0, 8, 16)) {
        val err = math.abs(((px(x, y) >> sh) & 0xff) - ((img.pixels(y * w + x) >> sh) & 0xff))
        assert(err <= 12, s"err $err at ($x,$y) shift $sh in ${w}x$h")
      }
    }
    // 3. malformed inputs throw, never misparse
    val enc = Jpeg.encodeJpegRgb(16, 8, (x, y) => (x * y) & 0xff)
    intercept[IllegalArgumentException](Jpeg.decodeJpeg("not a jpeg".getBytes))
    intercept[IllegalArgumentException]( // truncated mid-scan
      Jpeg.decodeJpeg(java.util.Arrays.copyOf(enc, enc.length / 2)))
    intercept[IllegalArgumentException] { // progressive SOF2 — unsupported
      val bad = enc.clone()
      val sof = bad.indices.find(i => (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xc0).get
      bad(sof + 1) = 0xc2.toByte
      Jpeg.decodeJpeg(bad)
    }
    intercept[IllegalArgumentException] { // sampling factor 4 — out of the 1..2 scope
      val bad = enc.clone()
      val sof = bad.indices.find(i => (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xc0).get
      bad(sof + 11) = 0x44.toByte // Y sampling 4x4 (FF C0 len2 prec h2 w2 n id → samp)
      Jpeg.decodeJpeg(bad)
    }
  }

  test("WebP codec: VP8L lossless roundtrip exact on arbitrary RGB; malformed/out-of-scope rejected") {
    // lossless — every pixel function must round-trip bit-exactly,
    // including 1-pixel images and dims around the 8-bit boundaries
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 16), (37, 23), (255, 2), (257, 1))) {
      def px(x: Int, y: Int): Int =
        (((x * 7 + y * 13) % 256) << 16) | (((x * 11 + y * 5 + 1) % 256) << 8) |
          ((x * 3 + y * 17 + 2) % 256)
      val img = Webp.decodeWebpLossless(Webp.encodeWebpLossless(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == px(x, y), s"($x,$y) in ${w}x$h")
    }
    // constant-color images take the 1-symbol simple-code path (0 bits
    // per pixel) — pin the roundtrip and that the stream is tiny
    for (c <- Seq(0x000000, 0xffffff, 0x3a7f11)) {
      val e = Webp.encodeWebpLossless(50, 40, (_, _) => c)
      assert(e.length < 64, s"constant image should be ~header-only, got ${e.length}")
      val img = Webp.decodeWebpLossless(e)
      assert(img.width == 50 && img.height == 40 && img.pixels.forall(_ == c))
    }
    val enc = Webp.encodeWebpLossless(16, 8, (x, y) => (x * y) & 0xff)
    intercept[IllegalArgumentException](Webp.decodeWebpLossless("not a webp at all".getBytes))
    intercept[IllegalArgumentException]( // truncated mid-bitstream
      Webp.decodeWebpLossless(java.util.Arrays.copyOf(enc, enc.length / 2)))
    intercept[IllegalArgumentException] { // lossy VP8 chunk — out of scope
      val bad = enc.clone()
      bad(12) = 'V'; bad(13) = 'P'; bad(14) = '8'; bad(15) = ' '
      Webp.decodeWebpLossless(bad)
    }
    intercept[IllegalArgumentException] { // a transform bit set — out of scope
      val bad = enc.clone()
      // VP8L header: sig byte at 20, then 14+14+1+3 = 32 bits of dims /
      // alpha / version, so the transform-present bit is bit 0 of byte 25
      bad(25) = (bad(25) | 0x01).toByte
      Webp.decodeWebpLossless(bad)
    }
  }

  test("WebP: VP8L inside a VP8X extended container decodes via decodeWebp") {
    // lossless + metadata files carry a VP8X header chunk before the
    // VP8L payload; the unified entry point must decode at its own
    // walk's chunk offset rather than re-walking with the VP8L-only
    // locator (which rejects VP8X)
    val w = 21; val h = 13
    def px(x: Int, y: Int): Int =
      (((x * 5 + y) % 256) << 16) | (((y * 9 + x) % 256) << 8) | ((x ^ y) % 256)
    val plain = Webp.encodeWebpLossless(w, h, px)
    // extract the VP8L chunk (starts at offset 12 in our encoder output)
    val vp8l = java.util.Arrays.copyOfRange(plain, 12, plain.length)
    val bos = new java.io.ByteArrayOutputStream()
    def u32le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val vp8x = new Array[Byte](10) // flags=0, canvas dims minus one, 24-bit LE
    vp8x(4) = ((w - 1) & 0xff).toByte
    vp8x(7) = ((h - 1) & 0xff).toByte
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(u32le(4 + 8 + 10 + vp8l.length))
    bos.write("WEBP".getBytes("US-ASCII"))
    bos.write("VP8X".getBytes("US-ASCII")); bos.write(u32le(10)); bos.write(vp8x)
    bos.write(vp8l)
    val img = Webp.decodeWebp(bos.toByteArray)
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xffffff) == px(x, y), s"($x,$y)")
  }

  test("d_minhash_md5: end-to-end LSH pipeline replayed exactly in memory") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh: Map[Long, Vector[String]] = texts.flatMap { case (id, t) =>
      val w = "\\S+".r.findAllIn(t).toVector
      if (w.length < 3) None
      else Some(id -> (0 to w.length - 3)
        .map(i => w.slice(i, i + 3).mkString(" ")).distinct.toVector)
    }.toMap
    val sig: Map[Long, Vector[String]] = sh.map { case (id, s) =>
      id -> (1 to 8).map(k => s.iterator.map(x => md5hex(s"$k:$x")).min).toVector
    }
    // bucket_b = md5(sig[2b] ++ sig[2b+1]) — r=2 rows per band, b=4 bands
    val cand: Set[(Long, Long)] = sig.toSeq
      .flatMap { case (id, g) =>
        (0 until 4).map(b => ((b, md5hex(g(2 * b) + g(2 * b + 1))), id))
      }
      .groupBy(_._1).values
      .flatMap { grp =>
        val ids = grp.map(_._2).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
      }.toSet
    val want = cand.toSeq.flatMap { case (a, b) =>
      val sa = sh(a).toSet; val sb = sh(b).toSet
      val inter = (sa & sb).size.toLong
      val jac = inter * 1000000L / (sa.size + sb.size - inter)
      if (jac >= 500000L) Some((a, b, jac)) else None
    }.sorted
    val got = graft.Queries.queryMap("d_minhash_md5")(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === want)
    assert(want.nonEmpty, "fixture corpus produced no verified near-dup pairs")
  }

  private def md5hexOf(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("d_winnow_md5: per-doc fingerprint set replayed exactly in memory") {
    val k = 7; val w = 4
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = texts.filter(_._2.length >= k + w - 1).map { case (id, t) =>
      val g = (0 to t.length - k)
        .map(i => md5hexOf(t.substring(i, i + k)) + ":" + f"$i%08d")
      val fps = (0 to g.length - w).map(j => g.slice(j, j + w).min)
        .distinct.sorted
      (id, fps.length.toLong, md5hexOf(fps.mkString("")))
    }.toSeq.sortBy(_._1)
    val got = graft.Queries.queryMap("d_winnow_md5")(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === want)
  }

  test("d_simhash_md5: signature, banding, and Hamming verify replayed in memory") {
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sigs: Map[Long, Long] = texts.flatMap { case (id, t) =>
      val hs = "\\S+".r.findAllIn(t).map(md5hexOf).toVector
      if (hs.isEmpty) None
      else Some(id -> (0 until 32).map { j =>
        val vote = hs.iterator
          .map(h => if ("13579bdf".contains(h.charAt(j))) 1 else -1).sum
        if (vote >= 0) 1L << j else 0L
      }.sum)
    }.toMap
    val byBand = sigs.toSeq
      .flatMap { case (id, sg) => Seq(((0, sg % 65536), id), ((1, sg / 65536), id)) }
      .groupBy(_._1).values
    val cand = byBand.flatMap { grp =>
      val ids = grp.map(_._2).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    val want = cand.toSeq.flatMap { case (a, b) =>
      val h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong
      if (h <= 6) Some((a, b, h)) else None
    }.sorted
    val got = graft.Queries.queryMap("d_simhash_md5")(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === want)
    assert(want.nonEmpty, "fixture corpus produced no Hamming-verified pairs")
  }

  test("d_wminhash_md5: weighted-MinHash expansion pipeline replayed in memory") {
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // bigram multisets and their (g, occurrence) expansions
    val tf: Map[Long, Map[String, Long]] = texts.flatMap { case (id, t) =>
      val w = "\\S+".r.findAllIn(t).toVector
      if (w.length < 2) None
      else Some(id -> (0 to w.length - 2).map(i => w(i) + " " + w(i + 1))
        .groupBy(identity).map { case (g, o) => g -> o.size.toLong })
    }.toMap
    val exp: Map[Long, Vector[String]] = tf.map { case (id, m) =>
      id -> m.toVector.flatMap { case (g, n) => (0L until n).map(o => s"$g#$o") }
    }
    // the identity the lane rests on: set-Jaccard of expansions equals
    // weighted Jaccard of the tf multisets
    def wj(a: Map[String, Long], b: Map[String, Long]): (Long, Long) = {
      val keys = a.keySet ++ b.keySet
      (keys.iterator.map(k => math.min(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).sum,
       keys.iterator.map(k => math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).sum)
    }
    val ids = tf.keys.toSeq.sorted.take(20)
    for (i <- ids; j <- ids if i < j) {
      val (mn, mx) = wj(tf(i), tf(j))
      val inter = (exp(i).toSet & exp(j).toSet).size.toLong
      val union = (exp(i).toSet | exp(j).toSet).size.toLong
      assert(inter === mn && union === mx, s"expansion identity broken for ($i,$j)")
    }
    val sig: Map[Long, Vector[String]] = exp.map { case (id, s) =>
      id -> (1 to 8).map(k => s.iterator.map(x => md5hexOf(s"$k:$x")).min).toVector
    }
    val cand: Set[(Long, Long)] = sig.toSeq
      .flatMap { case (id, g) =>
        (0 until 4).map(b => ((b, md5hexOf(g(2 * b) + g(2 * b + 1))), id))
      }
      .groupBy(_._1).values
      .flatMap { grp =>
        val s = grp.map(_._2).sorted
        for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
      }.toSet
    val want = cand.toSeq.flatMap { case (a, b) =>
      val (mn, mx) = wj(tf(a), tf(b))
      val ppm = mn * 1000000L / mx
      if (ppm >= 500000L) Some((a, b, ppm)) else None
    }.sorted
    val got = graft.Queries.queryMap("d_wminhash_md5")(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === want)
    assert(want.nonEmpty, "fixture corpus produced no weighted near-dup pairs")
  }
}
