package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * committed before/after plan evidence for optimization rounds
  * (plans/r<N>/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.ExplainDump OUTDIR SUFFIX name1,name2,...
  * (SUFFIX is e.g. "before" / "after"; sfDir via SPARK_GRAFT_SF_DIR,
  * defaults to the bench SF.)
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, namesCsv) = args.take(3)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val qs = graft.Queries.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      qs.get(n) match {
        case None => System.err.println(s"[explain] unknown query: $n")
        case Some(q) =>
          // Streaming lanes execute inside build(); their returned frame
          // is the memory-sink table — the formatted plan still records
          // the read-back shape, which is not the interesting part, so
          // note it in the header.
          val header = s"== $n @ $sfDir (explain formatted) ==\n"
          try {
            val df = q.build(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
              (header + txt).getBytes("UTF-8"))
            println(s"[explain] wrote $outDir/${n}_$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explain] $n failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
