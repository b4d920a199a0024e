package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark test suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VariantFunctions.register(s)
    s
  }
  val SF: String = "/root/testdata/sf0.001"
}
