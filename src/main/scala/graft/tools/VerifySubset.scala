package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dump a SUBSET of SparkEntry.queries to parquet for targeted local
  * oracle comparison (dev loop for new queries; graft.Verify is the
  * full driver gate). Run:
  * sbt "runMain graft.tools.VerifySubset <sfDir> <outDir> <q1> <q2> ..."
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n.parquet")
      println(s"[verify-subset] wrote $n")
    }
    val sqls = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _)).toMap
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
