package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{VariantFunctions => vf}
object CjProbe {
  def time(label: String)(f: => Unit): Unit = {
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[cjprobe] $label%-28s ${ts.min}%.3f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs = Tables.documents(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), array_distinct(vf.shingle_tokens(col("text"), 3)).as("toks"))
      .filter(size(col("toks")) >= 4)
      .localCheckpoint()
    val ranked = graft.operators.CurationQueries.rankedTokens(docs).localCheckpoint()
    println("ranked rows: " + ranked.count())
    val tNum = 9; val tDen = 10
    val prefixA = ranked.filter(col("rank") <=
      col("sz") - expr(s"($tNum * sz + ${tDen - 1}) div $tDen") + 1)
    println("prefix rows: " + prefixA.count())
    val cand = prefixA.as("a").join(ranked.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") =!= col("b.doc_id")
          && (least(col("a.sz") - col("a.rank"), col("b.sz") - col("b.rank")) + 1)
               * tDen >= col("a.sz") * tNum)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    time("candidate join (pre-distinct)") { noop(cand) }
    println("cand rows: " + cand.count())
    val dist = cand.distinct()
    time("cand+distinct") { noop(dist) }
    println("dist rows: " + dist.count())
    val ver = dist
      .join(docs.select(col("doc_id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
      .withColumn("n_inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("n_a", size(col("ta")).cast("long"))
      .filter(col("n_inter") * tDen >= col("n_a") * tNum)
    time("full verify") { noop(ver) }
    time("registered query") {
      noop(graft.SparkEntry.queries("d_containment_join")(spark, d))
    }
    time("registered query again") {
      noop(graft.SparkEntry.queries("d_containment_join")(spark, d))
    }
    spark.stop()
  }
}
