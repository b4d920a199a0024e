package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (BASELINE.md): every declared query runs at sf0.001 and the
  * known-nonempty ones return rows.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val mayBeEmpty = Set("e_cosine_near_dup", "d_minhash_lsh", "d_simhash",
    "d_ngram_jaccard", "q_anti_join", "q_set_except")

  Queries.all.foreach { q =>
    test(s"query ${q.name} runs on sf0.001") {
      val n = q.build(spark, TestSpark.SF).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or a documented omission") {
    val noOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // only the approximate (non-SQL-expressible) operators may omit oracles
    assert(noOracle.subsetOf(Set("d_minhash_lsh", "d_simhash")))
  }
}
