package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** BroadcastRangeJoin (plans/BroadcastRangeJoin.scala): result equality
  * against the naive theta-join formulation, the plan shape (custom
  * node, no exchange on the stream side), and the edge cases the binary
  * search must survive.
  */
class BroadcastRangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def points = Tables.events(spark, TestSpark.SF)
    .select(col("event_id"), expr("unix_micros(ts)").as("t"))

  private def intervals = {
    // overlapping, variable-length intervals anchored on event times:
    // every 37th event opens [t, t + len) with len cycling 1..5 minutes
    Tables.events(spark, TestSpark.SF)
      .filter(col("event_id") % 37 === 0)
      .select(col("event_id").as("iv_id"),
        expr("unix_micros(ts)").as("lo"),
        expr("unix_micros(ts) + ((event_id % 5) + 1) * 60000000").as("hi"))
  }

  test("matches the naive theta join exactly (overlapping variable-length intervals)") {
    val fast = graft.operators.Joins
      .broadcastRangeJoin(points, intervals, "t", "lo", "hi")
      .select(col("event_id"), col("iv_id"))
    val naive = points.as("p").crossJoin(intervals.as("i"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select(col("event_id"), col("iv_id"))
    assert(fast.count() > 0, "fixture produced no containments — test is vacuous")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "custom range join disagrees with the naive formulation")
  }

  test("plan: custom node present, stream side unshuffled") {
    val df = graft.operators.Joins
      .broadcastRangeJoin(points, intervals, "t", "lo", "hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan)
    // the stream side feeds the join straight from its scan: no Exchange
    // may appear between the join node and the points scan
    val joinIdx = plan.indexOf("BroadcastRangeJoin")
    val streamSection = plan.substring(joinIdx)
    assert(!streamSection.linesIterator.take(4).mkString("\n").contains("Exchange"),
      s"stream side shuffled:\n$plan")
  }

  test("edge cases: empty interval side, NULL point, inverted interval dropped") {
    val emptyIv = intervals.filter(lit(false))
    assert(graft.operators.Joins
      .broadcastRangeJoin(points, emptyIv, "t", "lo", "hi").count() == 0)

    val nullPoints = points
      .withColumn("t", when(col("event_id") % 2 === 0, col("t")))
    val fast = graft.operators.Joins
      .broadcastRangeJoin(nullPoints, intervals, "t", "lo", "hi")
    val naive = nullPoints.crossJoin(intervals)
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
    assert(fast.count() == naive.count())

    // inverted bounds (lo > hi) match nothing, like the SQL predicate
    val inverted = intervals.select(col("iv_id"), col("hi").as("lo"),
      (col("lo") - 1L).as("hi"))
    assert(graft.operators.Joins
      .broadcastRangeJoin(points, inverted, "t", "lo", "hi").count() == 0)
  }

  test("plain SQL BETWEEN join plans the custom operator; disabled-threshold run agrees") {
    points.createOrReplaceTempView("brj_points")
    intervals.createOrReplaceTempView("brj_intervals")
    val sql = """SELECT event_id, iv_id FROM brj_points p
                |JOIN brj_intervals i ON p.t BETWEEN i.lo AND i.hi""".stripMargin
    val fast = spark.sql(sql)
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"),
      s"SQL containment join did not plan the custom operator:\n$plan")
    val fastRows = fast.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // with broadcast disabled and the right side not stats-small, the
    // strategy declines and Spark falls back to BNLJ — same rows
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val slow = spark.sql(sql)
      val slowPlan = slow.queryExecution.executedPlan.toString
      // fallback is the nested-loop family (Spark picks CartesianProduct
      // for a conditioned inner join once nothing is broadcastable)
      assert(!slowPlan.contains("BroadcastRangeJoin") &&
        (slowPlan.contains("CartesianProduct") ||
          slowPlan.contains("BroadcastNestedLoopJoin")), slowPlan)
      assert(slow.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        .sameElements(fastRows))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SQL path declines on extra conjuncts, strict bounds, and non-long types") {
    points.createOrReplaceTempView("brj_points")
    intervals.createOrReplaceTempView("brj_intervals")
    for (cond <- Seq(
        "p.t >= i.lo AND p.t <= i.hi AND p.event_id <> i.iv_id", // extra conjunct
        "p.t > i.lo AND p.t <= i.hi",                             // strict bound
        "CAST(p.t AS DOUBLE) >= i.lo AND p.t <= i.hi")) {         // type mismatch
      val plan = spark.sql(
        s"SELECT event_id, iv_id FROM brj_points p JOIN brj_intervals i ON $cond")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastRangeJoin"),
        s"strategy fired where semantics differ ($cond):\n$plan")
    }
  }
}
