package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probe for d_dup_ngrams (dev-only). */
object DnProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dn] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val tk = graft.Tables.documents(spark, d)
      .select(col("doc_id"), graft.operators.TextAnalysis.tokens("text").as("w"))
    (1 to 2).foreach { pass =>
      t(s"p$pass tokenize+count") { tk.write.mode("overwrite").format("noop").save() }
      val ng = tk.filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 7), " +
            "i -> struct(i AS p, xxhash64(concat_ws(' ', slice(w, i, 8))) AS k))")).as("s"))
        .select(col("doc_id"), col("s.p").as("p"), col("s.k").as("k"))
      t(s"p$pass ng explode+hash") { ng.write.mode("overwrite").format("noop").save() }
      val dup = ng.groupBy(col("k"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select(col("k"))
      t(s"p$pass dup groupBy") { dup.write.mode("overwrite").format("noop").save() }
      val semi = ng.join(dup, Seq("k"), "left_semi")
      t(s"p$pass semi join") { semi.write.mode("overwrite").format("noop").save() }
      println("  ng rows=" + t(s"p$pass ng count") { ng.count() } +
        " dup rows=" + t(s"p$pass dup count") { dup.count() })
    }
    spark.stop()
  }
}
