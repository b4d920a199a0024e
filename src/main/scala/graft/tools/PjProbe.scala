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

    // v3: df via groupBy + broadcast join (27k vocab IS broadcastable at
    // this sf; at 100 TB fall back to shuffle join automatically via AQE);
    // one combined doc window (rank + sz in one sort); PPJoin positional
    // + size filters on the candidate join BEFORE distinct.
    def v3(): Long = {
      val freq3 = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
      val wDocAll = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val pre = tok.join(broadcast(freq3), "tok")
        .withColumn("rank", row_number().over(wDoc))
        .withColumn("sz", count(lit(1)).over(wDocAll))
        .filter(col("rank") <= col("sz") - expr("(7 * sz + 9) div 10") + 1)
        .select(col("tok"), col("doc_id"), col("rank"), col("sz"))
      val cand = pre.as("a").join(pre.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
            // size filter: J >= 0.7 requires 10*min >= 7*max
            && least(col("a.sz"), col("b.sz")) * 10 >=
               greatest(col("a.sz"), col("b.sz")) * 7
            // positional filter: remaining overlap must reach
            // alpha = ceil(t/(1+t) * (sz_a+sz_b)) with t = 7/10
            && (least(col("a.sz") - col("a.rank"), col("b.sz") - col("b.rank")) + 1) * 17 >=
               (col("a.sz") + col("b.sz")) * 7)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
      cand
        .join(docs.select(col("doc_id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
        .withColumn("n_inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .withColumn("n_union", (size(col("ta")) + size(col("tb"))).cast("long") - col("n_inter"))
        .filter(col("n_inter") * 10 >= col("n_union") * 7)
        .count()
    }
    time("v3 full query")(v3())
    time("v3 full query again")(v3())

    // v4: same as v3 but NO broadcast hint on freq — does AQE convert
    // the vocab join to broadcast at runtime (safe at 100 TB where the
    // vocab is corpus-sized and must shuffle)?
    def v4(): Long = {
      val freq3 = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
      val wDocAll = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val pre = tok.join(freq3, "tok")
        .withColumn("rank", row_number().over(wDoc))
        .withColumn("sz", count(lit(1)).over(wDocAll))
        .filter(col("rank") <= col("sz") - expr("(7 * sz + 9) div 10") + 1)
        .select(col("tok"), col("doc_id"), col("rank"), col("sz"))
      val cand = pre.as("a").join(pre.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
            && least(col("a.sz"), col("b.sz")) * 10 >=
               greatest(col("a.sz"), col("b.sz")) * 7
            && (least(col("a.sz") - col("a.rank"), col("b.sz") - col("b.rank")) + 1) * 17 >=
               (col("a.sz") + col("b.sz")) * 7)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
      cand
        .join(docs.select(col("doc_id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
        .withColumn("n_inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .withColumn("n_union", (size(col("ta")) + size(col("tb"))).cast("long") - col("n_inter"))
        .filter(col("n_inter") * 10 >= col("n_union") * 7)
        .count()
    }
    time("v4 full query (no hint)")(v4())
    time("v4 full query again")(v4())
    // candidate count under v3 filters
    locally {
      val freq3 = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
      val wDocAll = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      val pre = tok.join(broadcast(freq3), "tok")
        .withColumn("rank", row_number().over(wDoc))
        .withColumn("sz", count(lit(1)).over(wDocAll))
        .filter(col("rank") <= col("sz") - expr("(7 * sz + 9) div 10") + 1)
        .select(col("tok"), col("doc_id"), col("rank"), col("sz"))
      time("v3 candidates") {
        pre.as("a").join(pre.as("b"),
            col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
              && least(col("a.sz"), col("b.sz")) * 10 >=
                 greatest(col("a.sz"), col("b.sz")) * 7
              && (least(col("a.sz") - col("a.rank"), col("b.sz") - col("b.rank")) + 1) * 17 >=
                 (col("a.sz") + col("b.sz")) * 7)
          .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      }
    }
    spark.stop()
  }
}
