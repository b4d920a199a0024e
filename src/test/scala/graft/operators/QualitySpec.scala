package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Queries, TestSpark}

/** Semantic invariants of the round-7 quality/time-series/filtered-ANN
  * queries that the end-to-end oracle hash cannot express directly.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val SF = TestSpark.SF

  private def run(name: String) = Queries.queryMap(name)(spark, SF)

  test("e_filtered_ann: every neighbor shares its probe's label") {
    val emb = graft.Tables.embeddings(spark, SF)
      .select($"vec_id", $"label")
    val res = run("e_filtered_ann")
    val bad = res
      .join(emb.withColumnRenamed("vec_id", "qid").withColumnRenamed("label", "qlabel"), "qid")
      .join(emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .filter($"label" =!= $"qlabel")
      .count()
    assert(bad === 0L)
  }

  test("q_ewma: matches an independent in-memory reference on one user") {
    val events = graft.Tables.events(spark, SF)
      .select($"event_id", $"user_id", $"ts", $"value")
    val u = events.groupBy($"user_id").count().orderBy($"count".desc, $"user_id")
      .head().getLong(0)
    val rows = events.filter($"user_id" === u)
      .orderBy($"ts", $"event_id")
      .select($"event_id", $"value").collect()
    val cents = rows.map(r => math.floor(r.getDouble(1) * 100 + 0.5).toLong)
    val expect = rows.indices.map { i =>
      val terms = (0 to 7).flatMap { k =>
        if (i - k >= 0) Some((1L << (7 - k), cents(i - k))) else None
      }
      rows(i).getLong(0) -> ((terms.map(t => t._1 * t._2).sum, terms.map(_._1).sum))
    }.toMap
    val got = run("q_ewma").filter($"event_id".isin(expect.keys.toSeq: _*))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    expect.foreach { case (id, (num, den)) =>
      assert(got(id) === ((num, den)), s"event $id")
    }
  }

  test("q_window_distinct: frame bound holds (1 <= n <= 100)") {
    val res = run("q_window_distinct")
    assert(res.filter($"n_distinct" < 1 || $"n_distinct" > 100).count() === 0L)
  }

  test("q_benford: digit counts cover every row exactly once") {
    val total = run("q_benford").agg(sum($"n")).head().getLong(0)
    val rows = graft.Tables.lineitem(spark, SF).count()
    assert(total === rows)
  }

  test("q_changepoint: cusum ends at zero (deviations telescope)") {
    // sum over all days of (N*n_j - S) = N*S - S*N = 0 exactly
    val last = run("q_changepoint").orderBy($"day".desc).head()
    assert(last.getLong(2) === 0L)
  }
}
