package graft.tools
import org.apache.spark.sql.SparkSession
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT split('thing', '') AS a, concat('¤', array_join(split('thing', ''), '¤'), '¤') AS b").show(false)
    val cnt = graft.operators.PipelineQueries.bpeCountExprForTest
    spark.sql(s"SELECT transform(array('the','thing','xyz','thethe','ant'), w -> $cnt) AS r").show(false)
    spark.stop()
  }
}
