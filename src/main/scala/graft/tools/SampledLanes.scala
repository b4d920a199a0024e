package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Engine side of the SAMPLED sf1 oracle gate (round-11, VERDICT r10
  * item 1) for the one quadratic-oracle lane whose output is a global
  * AGGREGATE: d_fuzzy_join groups all dist<=1 pairs down to two rows,
  * so its full-corpus output cannot be sliced to a doc sample after
  * the fact the way the pair-output lanes' can. This tool re-runs the
  * lane's EXACT code path (TextQueries.fuzzyJoinAgg — the refactored
  * body the production QueryDef calls) over the content-keyed doc
  * sample, writing `<outDir>/d_fuzzy_join_sampled.parquet` for
  * tools/sampled_gate.py to compare against the brute-force DuckDB
  * oracle over the same sample.
  *
  * The coin is the d_train_split md5 discipline: a doc is sampled iff
  * substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0a'  (rate 10/256 ~
  * 3.9%, ~2000 docs at sf1) — deterministic, content-keyed,
  * partitioning/cluster-invariant, and computable identically in
  * DuckDB so both sides select the same docs with no id list shipped.
  *
  * Usage: runMain graft.tools.SampledLanes <sfDir> <outDir>
  */
object SampledLanes {
  val DocCoin = "substring(md5(CAST(doc_id AS STRING)), 1, 2) < '0a'"

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sampledDocs = Tables.documents(spark, sfDir).filter(expr(DocCoin))
    graft.operators.TextQueries.fuzzyJoinAgg(sampledDocs)
      .write.mode("overwrite").parquet(s"$outDir/d_fuzzy_join_sampled.parquet")
    println(s"[sampled-lanes] wrote d_fuzzy_join_sampled to $outDir")
    spark.stop()
  }
}
