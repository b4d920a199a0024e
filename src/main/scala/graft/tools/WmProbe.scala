package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{VariantFunctions => vf}

/** Stage cost probe for weightedMinhashDedup (dev-only). */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wm] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val raw = graft.Tables.documents(spark, d)
      .select(col("doc_id").as("id"), col("text"))
    val toks = raw.repartition(col("id"))
      .withColumn("w", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .filter(size(col("w")) >= 2)
      .select(col("id"), graft.operators.Dedup.shingles("w", 2).as("toks"))
    (1 to 2).foreach { p =>
      t(s"p$p toks") { toks.write.mode("overwrite").format("noop").save() }
      val sigs = toks.withColumn("bandArr",
        vf.minhash_bands_of(vf.weighted_minhash_signature(col("toks"), 128), 32))
      t(s"p$p signatures+bands") { sigs.write.mode("overwrite").format("noop").save() }
      val banded = sigs.filter(col("bandArr").isNotNull)
        .select(col("id"), posexplode(col("bandArr")).as(Seq("band", "bucket")))
      val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
      val cand = a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
      println("  candidates=" + t(s"p$p candidates") { cand.count() })
    }
    spark.stop()
  }
}
