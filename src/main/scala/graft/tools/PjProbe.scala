package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PjProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.functions.VariantFunctions
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[pj] $label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val t00 = System.nanoTime()
    val docs = graft.Tables.documents(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), array_distinct(fn.shingle_tokens(col("text"), 3)).as("toks"))
      .localCheckpoint()
    println(f"[pj] checkpoint ${(System.nanoTime()-t00)/1e9}%.2f s")
    time("shingle+explode") {
      docs.select(col("doc_id"), explode(col("toks")).as("tok")).count()
    }
    val tok = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
    time("freq") { tok.groupBy(col("tok")).agg(count(lit(1))).count() }
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
    val prefix = tok.join(freq, "tok")
      .withColumn("rank", row_number().over(w))
      .withColumn("sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("rank") <= col("sz") - expr("(7 * sz + 9) div 10") + 1)
      .select(col("tok"), col("doc_id"))
    time("prefix rows") { prefix.count() }
    time("candidates") {
      prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    // v2: df via window over tok; single doc-side exchange
    def fullQuery(): Long = {
      val wTok = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
      val wDocAll = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val pre = tok.withColumn("df", count(lit(1)).over(wTok))
        .withColumn("rank", row_number().over(wDoc))
        .withColumn("sz", count(lit(1)).over(wDocAll))
        .filter(col("rank") <= col("sz") - expr("(7 * sz + 9) div 10") + 1)
        .select(col("tok"), col("doc_id"))
      val cand = pre.as("a").join(pre.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
      cand
        .join(docs.select(col("doc_id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
        .withColumn("n_inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .withColumn("n_union", (size(col("ta")) + size(col("tb"))).cast("long") - col("n_inter"))
        .filter(col("n_inter") * 10 >= col("n_union") * 7)
        .count()
    }
    time("v2 full query")(fullQuery())
    time("v2 full query again")(fullQuery())
    spark.stop()
  }
}
