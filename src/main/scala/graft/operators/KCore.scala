package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative k-core peeling over an undirected edge list `(i, j)`.
  *
  * Each round drops vertices whose CURRENT degree is < k, and every
  * edge touching a dropped vertex; the k-core is the fixpoint. One
  * round costs a degree aggregate plus two semi-joins — the shuffles
  * carry only vertex ids and edge pairs, never adjacency lists, so a
  * skewed (celebrity) vertex is just a big COUNT, not a wide row.
  * Lineage is truncated per round (localCheckpoint), the same
  * discipline as the connected-components and PageRank loops: an
  * r-deep iterative join DAG would otherwise re-derive every earlier
  * round at each action and re-plan a growing tree.
  *
  * Peeling converges in at most |V| rounds but typically very few; the
  * caller picks a round budget (convergence checks cost a driver
  * round-trip per round — production runs budget rounds, the same
  * trade recorded at d_pagerank).
  */
object KCore {

  /** The surviving edge set after each of `rounds` peel rounds
    * (index 0 = after round 1). */
  def peelRounds(edges: DataFrame, k: Int, rounds: Int): Seq[DataFrame] = {
    require(k >= 1 && rounds >= 1, s"k-core needs k>=1, rounds>=1: got ($k, $rounds)")
    var e = edges.select(col("i"), col("j")).localCheckpoint()
    (1 to rounds).map { _ =>
      val deg = e.select(col("i").as("v")).unionAll(e.select(col("j").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("v"))
      // Seq-key joins move the key column first — restore (i, j) order
      e = e.join(keep.withColumnRenamed("v", "i"), Seq("i"), "left_semi")
        .join(keep.withColumnRenamed("v", "j"), Seq("j"), "left_semi")
        .select(col("i"), col("j"))
        .localCheckpoint()
      e
    }
  }
}
