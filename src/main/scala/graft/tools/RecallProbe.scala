package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = graft.Tables.df(spark, d, "embeddings")
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(emb, probes, 5)
        .select(col("qid"), col("neighbor_id"))
      val nExact = exact.count()
      for ((name, df) <- Seq(
          ("lsh", Similarity.lshTopK(emb, probes, 5, bits = 8)),
          ("ivf", Similarity.ivfTopK(emb, probes, 5, indexKey = Some(d))),
          ("pq", graft.operators.Similarity.pqTopK(emb, probes, 5, indexKey = Some(d))),
          ("sq8", Similarity.sq8TopK(emb, probes, 5)))) {
        val hits = df.select(col("qid"), col("neighbor_id"))
          .join(exact, Seq("qid", "neighbor_id")).count()
        println(f"[recall] $sf $name%4s hits=$hits/$nExact = ${hits.toDouble / nExact}%.3f")
      }
    }
    spark.stop()
  }
}
