package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for Spark 4.1's NATIVE parquet variant shredding (round 9,
  * v_shredded_interop design): what the write confs produce in the
  * file footer, whether reads need allowReadingShredded, and what
  * PushVariantIntoScan does to the scan schema. Results recorded in
  * the v_shredded_interop QueryDef comment.
  */
object ShredInteropProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    println("== defaults ==")
    for (k <- Seq("spark.sql.variant.writeShredding.enabled",
      "spark.sql.variant.inferShreddingSchema",
      "spark.sql.variant.allowReadingShredded",
      "spark.sql.variant.pushVariantIntoScan",
      "spark.sql.variant.forceShreddingSchemaForTest"))
      println(s"$k = ${spark.conf.getOption(k)}")

    val sd = java.nio.file.Files.createTempDirectory("probe_shred_").toString
    val df = Seq((1L, """{"k": 42, "s": "x"}"""), (2L, """{"k": 97, "s": "y"}"""))
      .toDF("id", "j")
      .select(col("id"), expr("parse_json(j)").as("sv"))
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
    df.write.mode("overwrite").parquet(sd)
    spark.conf.set("spark.sql.variant.writeShredding.enabled", "false")
    spark.conf.set("spark.sql.variant.inferShreddingSchema", "false")

    println("== file footer schema (parquet-level) ==")
    val file = new java.io.File(sd).listFiles().filter(_.getName.endsWith(".parquet")).head
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
    println(reader.getFooter.getFileMetaData.getSchema.toString)
    reader.close()

    println("== read back (default confs) ==")
    val rd = spark.read.parquet(sd)
    rd.printSchema()
    println("-- to_json over the variant --")
    rd.select(col("id"), expr("to_json(sv)").as("j")).orderBy("id").show(false)
    println("-- variant_get WITHOUT pushVariantIntoScan --")
    spark.conf.set("spark.sql.variant.pushVariantIntoScan", "false")
    try {
      spark.read.parquet(sd)
        .select(col("id"), expr("variant_get(sv, '$.k', 'bigint')").as("k"))
        .orderBy("id").show()
    } catch { case e: Exception => println(s"FAILED: ${e.getMessage.take(200)}") }
    spark.conf.set("spark.sql.variant.pushVariantIntoScan", "true")
    println("-- variant_get WITH pushVariantIntoScan (plain session, no cache) --")
    try {
      val q = spark.read.parquet(sd)
        .filter(expr("variant_get(sv, '$.k', 'bigint') > 50"))
        .select(col("id"), expr("variant_get(sv, '$.k', 'bigint')").as("k"))
      q.show()
      q.explain("formatted")
    } catch { case e: Exception => println(s"FAILED: ${e.getMessage.take(300)}") }
    println("-- STOCK functions.variant_get (Scala API bypasses our SQL registry) --")
    try {
      val q3 = spark.read.parquet(sd)
        .filter(org.apache.spark.sql.functions.variant_get(col("sv"), "$.k", "bigint") > 50)
        .select(col("id"),
          org.apache.spark.sql.functions.variant_get(col("sv"), "$.k", "bigint").as("k"))
      q3.show()
      q3.explain("formatted")
    } catch { case e: Exception => println(s"FAILED: ${e.getMessage.take(300)}") }
    println("-- vf.variant_get over native variant (NativeVariantDispatch) --")
    try {
      val q4 = spark.read.parquet(sd)
        .filter(graft.functions.VariantFunctions.variant_get(col("sv"), "$.k",
          org.apache.spark.sql.types.LongType) > 50)
        .select(col("id"), graft.functions.VariantFunctions.variant_get(col("sv"), "$.k",
          org.apache.spark.sql.types.LongType).as("k"))
      q4.show()
      q4.explain("formatted")
    } catch { case e: Exception => println(s"FAILED: ${e.getMessage.take(300)}") }
    println("-- our from_spark_variant path over the shredded file --")
    try {
      val q2 = spark.read.parquet(sd)
        .select(col("id"), graft.functions.VariantFunctions.variant_get(
          graft.functions.VariantFunctions.from_spark_variant(col("sv")), "$.k",
          org.apache.spark.sql.types.LongType).as("k"))
      q2.show()
      q2.explain("formatted")
    } catch { case e: Exception => println(s"FAILED: ${e.getMessage.take(300)}") }
    spark.stop()
  }
}
