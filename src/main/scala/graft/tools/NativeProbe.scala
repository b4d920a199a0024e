package graft.tools
import org.apache.spark.sql.SparkSession
object NativeProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").appName("probe")
      .config("spark.sql.shuffle.partitions","2").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def q(sql: String): Unit =
      try println(sql + "  =>  " + s.sql(sql).collect()(0).get(0))
      catch { case e: Throwable => println(sql + "  =>  THROW " + e.getClass.getSimpleName + " " + String.valueOf(e.getMessage).take(120)) }
    q("""SELECT variant_get(parse_json('{"f": 3.7}'), '$.f', 'bigint')""")
    q("""SELECT variant_get(parse_json('{"f": 3.0}'), '$.f', 'bigint')""")
    q("""SELECT variant_get(parse_json('{"f": 2e0}'), '$.f', 'bigint')""")
    q("""SELECT variant_get(parse_json('{"f": 1.5}'), '$.f', 'int')""")
    q("""SELECT variant_get(parse_json('{"f": 3.7}'), '$.f', 'decimal(5,1)')""")
    q("""SELECT try_variant_get(parse_json('{"f": 3.7}'), '$.f', 'bigint')""")
    q("""SELECT variant_get(parse_json('{"b": true}'), '$.b', 'bigint')""")
    q("""SELECT variant_get(parse_json('{"s": "3.5"}'), '$.s', 'double')""")
    q("""SELECT variant_get(parse_json('{"s": "3.5"}'), '$.s', 'bigint')""")
    q("""SELECT variant_get(parse_json('{"k": 260}'), '$.k', 'tinyint')""")
    q("""SELECT variant_get(parse_json('{"a": [1,"x",3]}'), '$.a', 'array<bigint>')""")
    s.stop()
  }
}
