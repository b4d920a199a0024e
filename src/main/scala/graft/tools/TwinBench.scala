package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-harness mirror for a named subset of queries: same session
  * config, same noop sink, warm pass + min-of-3. For iterating on a
  * lane's plan without paying the full 301-query Bench. Args = query
  * names (default: the round-8 twin set). */
object TwinBench {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "d_minhash_md5", "d_simhash_md5", "d_winnow_md5", "d_wminhash_md5",
      "e_kmeans", "e_ivf_exact", "e_lsh_exact", "e_sq8_exact",
      "e_pq_exact", "e_ivfpq_exact", "e_semdedup_exact")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = names.map(n => n -> graft.Queries.queryMap(n))
    qs.foreach { case (_, fn) =>
      fn(spark, sf).write.mode("overwrite").format("noop").save()
    }
    val best = scala.collection.mutable.Map[String, Double]()
    for (_ <- 1 to 3; (name, fn) <- qs) {
      val t0 = System.nanoTime()
      fn(spark, sf).write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      best.updateWith(name)(p => Some(p.fold(t)(math.min(_, t))))
    }
    names.foreach(n => println(f"[twin] $n%-18s ${best(n)}%.2f s"))
    spark.stop()
  }
}
