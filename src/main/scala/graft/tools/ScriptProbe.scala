package graft.tools
import org.apache.spark.sql.SparkSession
object ScriptProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("scripting conf: " + spark.conf.getOption("spark.sql.scripting.enabled"))
    try {
      spark.conf.set("spark.sql.scripting.enabled", "true")
      val r = spark.sql(
        """BEGIN
          |  DECLARE total INT = 0;
          |  DECLARE i INT = 1;
          |  WHILE i <= 5 DO
          |    SET total = total + i * i;
          |    SET i = i + 1;
          |  END WHILE;
          |  SELECT total AS sum_sq;
          |END""".stripMargin)
      r.show()
    } catch { case e: Throwable => println("scripting failed: " + e.getMessage.take(300)) }
    // parameterized SQL
    try {
      val r2 = spark.sql("SELECT :a + :b AS s", Map("a" -> 40, "b" -> 2))
      r2.show()
    } catch { case e: Throwable => println("param failed: " + e.getMessage.take(200)) }
    // IDENTIFIER clause
    try {
      spark.range(3).createOrReplaceTempView("idtest")
      spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER(:tbl)", Map("tbl" -> "idtest")).show()
    } catch { case e: Throwable => println("identifier failed: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
