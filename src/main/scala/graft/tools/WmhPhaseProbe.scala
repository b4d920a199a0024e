package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VariantFunctions => vf}

/** Phase probe for d_wminhash_md5's PER-RUN cost at a deep curve point
  * (dev-only): with the tf/banded artifacts pre-built exactly like the
  * lane's cachedParquet tier, attribute the timed-pass cost across
  * candidate generation (bucket self-join + distinct + checkpoint) and
  * the merge-walk verification, and report the candidate count — the
  * number that decides whether a super-linear tail exponent is
  * candidate blow-up (LSH false positives growing ~n² under the
  * declared 8-hash/4-band twin signature) or per-candidate cost.
  *
  * Usage: runMain graft.tools.WmhPhaseProbe [sfDir]
  */
object WmhPhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf30x")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wmhp] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = graft.Tables.documents(spark, d)
    val tfDir = "/tmp/wmhp_tf"
    val bandedDir = "/tmp/wmhp_banded"
    val tf0 = docs
      .select(col("doc_id").as("id"),
        expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("id"), explode(vf.word_ngrams(col("w"), 2)).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("tf"))
    t("build tf artifact (kernel)") { tf0.write.mode("overwrite").parquet(tfDir) }
    val tf = spark.read.parquet(tfDir)
    val banded0 = tf
      .select(col("id"), explode(vf.repeat_indexed(col("g"), col("tf"))).as("x"))
      .groupBy(col("id")).agg(collect_list(col("x")).as("s"))
      .select(col("id"), vf.minhash_md5_sig(col("s"), 8).as("sig"))
      .select(col("id"), posexplode(expr(
        """transform(sequence(0, 3), b ->
          |  md5(concat(element_at(sig, 2 * b + 1), element_at(sig, 2 * b + 2))))"""
          .stripMargin)).as(Seq("band", "bucket")))
    t("build banded artifact (kernel)") {
      banded0.write.mode("overwrite").parquet(bandedDir)
    }
    val banded = spark.read.parquet(bandedDir)
    println(s"[wmhp] docs=${docs.count()} tf rows=${tf.count()} banded rows=${banded.count()}")

    (1 to 2).foreach { p =>
      val cand = t(s"p$p cand gen + checkpoint") {
        banded.as("a")
          .join(banded.as("b"), Seq("band", "bucket"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .dropDuplicates("id_a", "id_b")
          .localCheckpoint()
      }
      println(s"[wmhp] p$p candidates=${cand.count()}")
      val docmap = tf.groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("g"), col("tf")))).as("ent"),
          sum(col("tf")).as("stf"))
      val ma = docmap.select(col("id").as("ja"), col("ent").as("e_a"),
        col("stf").as("s_a"))
      val mb = docmap.select(col("id").as("jb"), col("ent").as("e_b"),
        col("stf").as("s_b"))
      t(s"p$p verify (merge walk)") {
        noop(cand
          .join(ma.hint("SHUFFLE_HASH"), col("id_a") === col("ja"))
          .join(mb.hint("SHUFFLE_HASH"), col("id_b") === col("jb"))
          .select(col("id_a"), col("id_b"),
            vf.sum_min_tf_sorted(col("e_a"), col("e_b")).as("smin"),
            (col("s_a") + col("s_b")).as("stot"))
          .select(col("id_a"), col("id_b"),
            expr("smin * 1000000 DIV (stot - smin)").as("wj_ppm"))
          .filter(col("wj_ppm") >= 500000L))
      }
      // variant: sound size prefilter (wj_ppm <= min(S)*1e6 DIV max(S))
      // before the entry-array joins — array-free small joins first
      val sizes = tf.groupBy(col("id")).agg(sum(col("tf")).as("stf"))
      val candSz = t(s"p$p size-prefilter") {
        cand
          .join(sizes.select(col("id").as("ja"), col("stf").as("s_a"))
            .hint("SHUFFLE_HASH"), col("id_a") === col("ja"))
          .join(sizes.select(col("id").as("jb"), col("stf").as("s_b"))
            .hint("SHUFFLE_HASH"), col("id_b") === col("jb"))
          .filter(expr("least(s_a, s_b) * 1000000 DIV greatest(s_a, s_b) >= 500000"))
          .select(col("id_a"), col("id_b"))
          .localCheckpoint()
      }
      println(s"[wmhp] p$p size-compatible candidates=${candSz.count()}")
      t(s"p$p verify (prefiltered merge walk)") {
        noop(candSz
          .join(ma.hint("SHUFFLE_HASH"), col("id_a") === col("ja"))
          .join(mb.hint("SHUFFLE_HASH"), col("id_b") === col("jb"))
          .select(col("id_a"), col("id_b"),
            vf.sum_min_tf_sorted(col("e_a"), col("e_b")).as("smin"),
            (col("s_a") + col("s_b")).as("stot"))
          .select(col("id_a"), col("id_b"),
            expr("smin * 1000000 DIV (stot - smin)").as("wj_ppm"))
          .filter(col("wj_ppm") >= 500000L))
      }
      // variant: prefilter + 8-byte hashed entry keys (struct<long,long>)
      val docmapH = tf.groupBy(col("id"))
        .agg(sort_array(collect_list(struct(xxhash64(col("g")).as("h"),
          col("tf")))).as("ent"), sum(col("tf")).as("stf"))
      val maH = docmapH.select(col("id").as("ja"), col("ent").as("e_a"),
        col("stf").as("s_a"))
      val mbH = docmapH.select(col("id").as("jb"), col("ent").as("e_b"),
        col("stf").as("s_b"))
      t(s"p$p verify (prefilter + hashed entries)") {
        noop(candSz
          .join(maH.hint("SHUFFLE_HASH"), col("id_a") === col("ja"))
          .join(mbH.hint("SHUFFLE_HASH"), col("id_b") === col("jb"))
          .select(col("id_a"), col("id_b"),
            vf.sum_min_tf_sorted(col("e_a"), col("e_b")).as("smin"),
            (col("s_a") + col("s_b")).as("stot"))
          .select(col("id_a"), col("id_b"),
            expr("smin * 1000000 DIV (stot - smin)").as("wj_ppm"))
          .filter(col("wj_ppm") >= 500000L))
      }
      candSz.unpersist()
      cand.unpersist()
    }
    spark.stop()
  }
}
