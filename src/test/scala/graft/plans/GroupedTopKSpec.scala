package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.operators.TopK

/** The custom grouped-top-k operator (logical + strategy + exec):
  * result equality with the window formulation, the two-phase plan
  * shape, and the map-side pruning bound.
  */
class GroupedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lineitem = Tables.lineitem(spark, TestSpark.SF)

  private def rowSet(df: org.apache.spark.sql.DataFrame) = df
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    .toSet

  test("equals the window row_number formulation (total order, k=3)") {
    val l = lineitem.repartition(7) // force multi-partition partial phase
    val ours = TopK.groupedTopK(l, Seq("l_orderkey"),
      Seq(l("l_quantity").desc, l("l_extendedprice").desc,
        l("l_suppkey"), l("l_partkey"), l("l_linenumber")), 3)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity").desc, col("l_extendedprice").desc,
        col("l_suppkey"), col("l_partkey"), col("l_linenumber"))
    val ref = lineitem.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(rowSet(ours) === rowSet(ref))
    assert(rowSet(ours).nonEmpty)
  }

  test("k larger than every group passes all rows through") {
    val l = lineitem
    val ours = TopK.groupedTopK(l, Seq("l_orderkey"),
      Seq(l("l_quantity").desc, l("l_extendedprice").desc,
        l("l_suppkey"), l("l_partkey"), l("l_linenumber")), 1000)
    assert(ours.count() === lineitem.count())
  }

  test("empty group list = global top-k, equals orderBy.limit") {
    val l = lineitem
    val ours = TopK.groupedTopK(l, Seq.empty,
      Seq(l("l_extendedprice").desc, l("l_orderkey"), l("l_linenumber"),
        l("l_suppkey"), l("l_partkey")), 5)
    val ref = lineitem.orderBy(col("l_extendedprice").desc, col("l_orderkey"),
      col("l_linenumber"), col("l_suppkey"), col("l_partkey")).limit(5)
    assert(rowSet(ours) === rowSet(ref))
  }

  test("plan: partial heap below ONE exchange, final above it") {
    val l = lineitem.repartition(7)
    val plan = TopK.groupedTopK(l, Seq("l_orderkey"),
      Seq(l("l_quantity").desc, l("l_linenumber"), l("l_suppkey"),
        l("l_partkey"), l("l_extendedprice")), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopKPartial"), plan)
    assert(plan.contains("GroupedTopKFinal"), plan)
    val exchangeFirst = plan.indexOf("Exchange hashpartitioning(l_orderkey")
    assert(exchangeFirst >= 0, plan)
    // final sits above the exchange, partial below it
    assert(plan.indexOf("GroupedTopKFinal") < exchangeFirst, plan)
    assert(plan.indexOf("GroupedTopKPartial") > exchangeFirst, plan)
  }

  test("composes with the variant fusion rule: fused extraction feeds the heap in one plan") {
    // v_grouped_topk orders by variant_get(variant_from_json(props), '$.k'):
    // the optimizer must BOTH fuse the extraction (json_path_extract, no
    // intermediate variant bytes) AND place the two-phase heap exec —
    // proving the custom Expression rewrite and the custom Strategy
    // compose in a single plan.
    val df = graft.Queries.queryMap("v_grouped_topk")(spark, graft.TestSpark.SF)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopKPartial"), plan)
    assert(plan.contains("GroupedTopKFinal"), plan)
    assert(plan.contains("json_path_extract"), plan)
    assert(!plan.contains("variant_from_json"), s"parse not fused:\n$plan")
    // and it must actually produce rows
    assert(df.limit(1).count() === 1)
  }

  test("partial phase bounds shuffled rows to k per (group, partition)") {
    // drive the partial exec directly: per input partition no group may
    // contribute more than k rows
    // AQE wraps the tree in AdaptiveSparkPlanExec; turn it off so the
    // exec nodes are directly collectible
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val l = lineitem.repartition(7)
      val df = TopK.groupedTopK(l, Seq("l_orderkey"),
        Seq(l("l_quantity").desc, l("l_extendedprice").desc,
          l("l_suppkey"), l("l_partkey"), l("l_linenumber")), 2)
      val partial = df.queryExecution.executedPlan.collect {
        case e: GroupedTopKExec if e.partial => e
      }.head
      val perPartition = partial.execute().mapPartitions { iter =>
        Iterator(iter.size)
      }.collect()
      val totalIn = lineitem.count()
      assert(perPartition.sum < totalIn,
        s"partial phase did not prune: ${perPartition.sum} of $totalIn")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
