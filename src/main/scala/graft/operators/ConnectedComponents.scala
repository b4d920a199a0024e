package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph by large-star/small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the round-count is O(log n) in the component
  * DIAMETER-independent sense, vs the simple min-label propagation
  * whose round count equals the diameter (a 10^4-long dup chain would
  * need 10^4 shuffles; this needs ~14).
  *
  * Each round is two grouped aggregations plus joins over the EDGE
  * table only (dup pairs — orders of magnitude smaller than the
  * corpus); no step ever touches per-node adjacency lists wider than
  * the grouped min, so skewed hub nodes cost one combiner-side min,
  * not a materialized neighborhood.
  *
  * large-star(u): every neighbor v > u re-attaches to m = min(Γ(u)∪{u}).
  * small-star(u): every neighbor v ≤ u (and u itself) attaches to the
  * minimum of the small neighborhood. The fixed point is one star per
  * component centered at the component minimum.
  */
object ConnectedComponents {

  /** One large-star round. Input/output: undirected edge set, one row
    * per edge in canonical (hi, lo) orientation, no self loops.
    */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("nbrMin"))
      .select(col("u"), least(col("u"), col("nbrMin")).as("m"))
    sym.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      // emitted (v, m) has v > u ≥ m, so it is already (hi, lo)
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round over canonically (hi, lo)-oriented edges. */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    oriented.join(mins, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** Component labels for every vertex of `pairs` (cluster id = the
    * component's minimum vertex id). Returns the labels and the number
    * of alternation rounds executed (exposed so tests can pin the
    * O(log n) bound on diameter-heavy graphs).
    *
    * Convergence test per round is one driver-side aggregate
    * (count + xor of edge hashes) over the checkpointed round result —
    * the same "aggregate over the edge table" cost every BSP connected-
    * components formulation pays; the data itself never leaves
    * executors, and localCheckpoint truncates the per-round lineage.
    */
  def labelComponents(pairs: DataFrame, maxIter: Int = 25): (DataFrame, Int) = {
    val raw = pairs.toDF("u", "v").filter(col("u") =!= col("v"))
    val sym = raw.union(raw.select(col("v").as("u"), col("u").as("v")))

    // One min-neighbor CONTRACTION before the alternation: every node
    // merges into m(u) = min(Γ(u) ∪ {u}) — m(u) is itself in the
    // component (a neighbor or u), so connectivity is preserved, and a
    // component's global minimum g has m(g) = g, so component minima
    // survive as contracted-graph nodes and labels compose by one join.
    // Near-dup graphs are clique-heavy (copies of one document pair up
    // all-to-all), and a clique contracts to a single node — the
    // expensive first alternation round over the full edge set becomes
    // one grouped min + one edge-remap, and the alternation then runs
    // on the contracted graph only.
    val m = sym.groupBy("u").agg(min(col("v")).as("nbrMin"))
      .select(col("u"), least(col("u"), col("nbrMin")).as("m"))
      .localCheckpoint()
    var edges = raw
      .join(m.select(col("u"), col("m").as("cu")), Seq("u"))
      .join(m.select(col("u").as("v"), col("m").as("cv")), Seq("v"))
      .select(col("cu").as("u"), col("cv").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(hash(col("u"), col("v")).cast("long")), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    var fp = fingerprint(edges)
    var iter = 0
    var converged = fp._1 == 0L
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      edges = next
      fp = nfp
      iter += 1
    }

    // fixed point: stars centered at component minima — non-roots point
    // at their root, roots label themselves
    val starLabels = edges.select(col("u").as("m"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("m"), col("v").as("cluster_id")))
      .groupBy(col("m")).agg(min(col("cluster_id")).as("cluster_id"))
    // compose with the contraction: label(u) = starLabel(m(u)), falling
    // back to m(u) itself where the contraction already finished the
    // component (its root has no surviving contracted edge)
    val labels = m.join(starLabels, Seq("m"), "left")
      .select(col("u").as("doc_id"),
        coalesce(col("cluster_id"), col("m")).as("cluster_id"))
    (labels, iter)
  }
}
