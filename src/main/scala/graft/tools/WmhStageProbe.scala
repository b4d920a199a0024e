package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage cost probe for d_wminhash_md5 (dev-only): attributes the lane's
  * per-pass cost across (artifact reads, candidate generation, the
  * verification join) and times alternative verify plan shapes, to find
  * where the post-parquet-artifact regression at 10x/30x lives.
  *
  * Usage: runMain graft.tools.WmhStageProbe [sfDir]
  */
object WmhStageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wmh] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = graft.Tables.documents(spark, d)
    // ---- artifact builds (amortized across passes in the bench) ----
    val tfDir = "/tmp/wmh_probe_tf"
    val bandedDir = "/tmp/wmh_probe_banded"
    val tf0 = docs
      .select(col("doc_id").as("id"),
        expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))"))
        .as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("tf"))
    t("build tf -> parquet") { tf0.write.mode("overwrite").parquet(tfDir) }
    val tf = spark.read.parquet(tfDir)
    val ex = tf
      .select(col("id"), explode(expr(
        "transform(sequence(CAST(0 AS BIGINT), tf - 1), j -> concat(g, '#', CAST(j AS STRING)))"))
        .as("x"))
      .groupBy(col("id")).agg(collect_list(col("x")).as("s"))
    val banded0 = ex
      .select(col("id"), expr(
        """transform(sequence(1, 8), k ->
          |  array_min(transform(s, x -> md5(concat(CAST(k AS STRING), ':', x)))))"""
          .stripMargin).as("sig"))
      .select(col("id"), posexplode(expr(
        """transform(sequence(0, 3), b ->
          |  md5(concat(element_at(sig, 2 * b + 1), element_at(sig, 2 * b + 2))))"""
          .stripMargin)).as(Seq("band", "bucket")))
    t("build banded -> parquet") { banded0.write.mode("overwrite").parquet(bandedDir) }
    val banded = spark.read.parquet(bandedDir)

    println(s"[wmh] tf rows=${tf.count()}  banded rows=${banded.count()}")
    t("tf parquet full scan") { noop(tf) }
    t("banded parquet full scan") { noop(banded) }

    def candDf = banded.as("a")
      .join(banded.as("b"), Seq("band", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    def verify(cand: DataFrame, hintOnCand: Boolean): DataFrame = {
      def side(k: String) = {
        val c = if (hintOnCand) cand.hint("SHUFFLE_HASH") else cand
        val tt = if (hintOnCand) tf else tf.hint("SHUFFLE_HASH")
        c.join(tt, col(k) === tf("id"))
          .select(col("id_a"), col("id_b"), col("g"), col("tf"))
      }
      side("id_a").union(side("id_b"))
        .groupBy(col("id_a"), col("id_b"), col("g"))
        .agg(count(lit(1)).as("n_sides"), min(col("tf")).as("mn0"),
          max(col("tf")).as("mx"))
        .select(col("id_a"), col("id_b"),
          when(col("n_sides") === 2, col("mn0")).otherwise(lit(0L)).as("mn"),
          col("mx"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(expr("sum(mn) * 1000000 DIV sum(mx)").as("wj_ppm"))
        .filter(col("wj_ppm") >= 500000L)
    }

    (1 to 2).foreach { p =>
      t(s"p$p cand compute (count)") { println("  cand=" + candDf.count()) }
      // current lane shape: cand recomputed per side, build side = tf
      t(s"p$p verify CURRENT (cand x2, build=tf)") { noop(verify(candDf, hintOnCand = false)) }
      // variant: cand checkpointed once per run
      val candCk = t(s"p$p cand localCheckpoint") { candDf.localCheckpoint() }
      t(s"p$p verify (candCk, build=tf)") { noop(verify(candCk, hintOnCand = false)) }
      t(s"p$p verify (candCk, build=cand)") { noop(verify(candCk, hintOnCand = true)) }
      candCk.unpersist()
    }
    spark.stop()
  }
}
