package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an sf1-scale dataset from sf0.1 for the 10x bench soak
  * (VERDICT r8 item 1: "every scale claim is design-argued, not
  * measured"). The driver testdata stops at sf0.1 and is read-only, so
  * the 10x set is DERIVED: `factor` key-shifted replicas per table,
  * with two distribution-preserving twists so the derived corpus keeps
  * sf0.1's structure instead of becoming a pathological clique:
  *
  *  - documents text goes through a per-replica SUBSTITUTION CIPHER
  *    over printable ASCII (whitespace fixed, `translate`, length
  *    preserving): token/char statistics and the WITHIN-replica
  *    duplicate structure are identical to sf0.1, but replicas share
  *    no shingles — without this every doc would have `factor` exact
  *    twins and the near-dup lanes would measure answer-size blowup
  *    (pairs ~ factor^2 per clique, the wminhash_x16 soak lesson), not
  *    scale behavior.
  *  - embeddings rotate components per replica (distance-preserving
  *    within a replica, decorrelated across) for the same reason.
  *  - events/TPC-H replicate with shifted ids; nation/region stay the
  *    fixed dimension tables exactly as TPC-H itself scales.
  *
  * Each table lands as ONE parquet FILE named `<table>.parquet`
  * (matching the driver layout — the streaming lanes Files.copy those
  * paths as single files).
  *
  * Usage: runMain graft.tools.ScaleData /root/testdata/sf0.1 /tmp/graft_sf1 10
  */
object ScaleData {
  private val Shift = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** factor replicas, each transformed by `tx(df, r)`; r=0 verbatim. */
    def reps(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => tx(df, r)).reduce(_ union _)

    def shifted(c: String, r: Int) = (col(c) + lit(Shift * r)).as(c)

    /** Entity NAMES stay 1:1 with their keys across replicas, as real
      * TPC-H data is at every SF (dbgen derives names from keys).
      * Replica 0 keeps the original name; later replicas suffix it —
      * without this, name-grouped queries (Q21's GROUP BY s_name)
      * change cardinality on the derived corpus while key-grouped
      * plans do not, a pure data artifact the sf1 oracle gate caught. */
    def renamed(c: String, r: Int) =
      (if (r == 0) col(c) else concat(col(c), lit(s"#R$r"))).as(c)

    /** Per-replica substitution cipher over printable ASCII 33..126;
      * replica 0 is the identity. Whitespace untouched. */
    def cipher(c: String, r: Int) = {
      if (r == 0) col(c)
      else {
        val from = (33 to 126).map(_.toChar).mkString
        val to = (33 to 126).map(i => (33 + ((i - 33 + 7 * r) % 94)).toChar).mkString
        translate(col(c), from, to)
      }
    }

    /** Write as a single parquet FILE at $dst/$name.parquet. */
    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/_tmp_$name"
      // 8 MB row groups keep the single file SPLITTABLE: parquet
      // parallelism is bounded by row-group count, and a default
      // 128 MB group would make every sf1 scan a single task (the
      // round-9 bench found exactly that).
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (8 * 1024 * 1024).toString)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dst/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      println(s"[scale] $name: ${new java.io.File(s"$dst/$name.parquet").length() / 1024} KiB")
    }

    // fixed dimensions: verbatim (TPC-H keeps nation/region constant)
    writeOne(read("region"), "region")
    writeOne(read("nation"), "nation")

    writeOne(reps(read("customer")) { (df, r) =>
      df.select(shifted("c_custkey", r), renamed("c_name", r), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    }, "customer")

    writeOne(reps(read("supplier")) { (df, r) =>
      df.select(shifted("s_suppkey", r), renamed("s_name", r), col("s_nationkey"),
        col("s_acctbal"))
    }, "supplier")

    writeOne(reps(read("part")) { (df, r) =>
      df.select(shifted("p_partkey", r), renamed("p_name", r), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
    }, "part")

    writeOne(reps(read("orders")) { (df, r) =>
      df.select(shifted("o_orderkey", r), shifted("o_custkey", r),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }, "orders")

    writeOne(reps(read("lineitem")) { (df, r) =>
      df.select(shifted("l_orderkey", r), shifted("l_partkey", r),
        shifted("l_suppkey", r), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }, "lineitem")

    // events: ids shift; ts/value/props verbatim (props is JSON the
    // variant lanes parse — a cipher would corrupt it; 10x rows per
    // time window is exactly what a bigger deployment looks like)
    writeOne(reps(read("events")) { (df, r) =>
      df.select(shifted("event_id", r), col("ts"), shifted("user_id", r),
        col("event_type"), col("value"), col("props"))
    }, "events")

    writeOne(reps(read("documents")) { (df, r) =>
      df.select(shifted("doc_id", r), cipher("text", r).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, "documents")

    writeOne(reps(read("embeddings")) { (df, r) =>
      val k = (7 * r) % 64
      val rot =
        if (k == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), slice(embedding, 1, $k))")
      df.select(shifted("vec_id", r), rot.as("embedding"), col("label"))
    }, "embeddings")

    spark.stop()
  }
}
