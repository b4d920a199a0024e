package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark test suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[4, 2]: 4 threads, task maxFailures = 2 — ChaosRetrySpec
    // injects first-attempt task failures and needs the scheduler to
    // retry them (a deterministic real failure still fails the job,
    // just after one retry). spark.speculation is context-level state
    // set here for the same spec; note local mode never actually
    // launches speculative duplicates (TaskSchedulerImpl guards on
    // !isLocal) — the retry path is what the chaos spec exercises.
    val s = Tables.configure(SparkSession.builder()
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.speculation", "true")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VariantFunctions.register(s)
    s
  }
  val SF: String = "/root/testdata/sf0.001"
}
