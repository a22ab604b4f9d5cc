package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge-list DataFrames — the operators a corpus
  * pipeline needs once near-duplicate candidates, citation links, or user
  * co-occurrence form a graph: centrality (PageRank) to rank nodes,
  * bounded-hop reachability (BFS) to expand a seed set, and triangle
  * counting to measure clustering. Complements [[Components]] (which
  * answers "which cluster"), these answer "how central / how far / how
  * dense".
  *
  * All three are declarative shuffle-join shapes, not driver loops: each
  * iteration is one join + one aggregate, both hash-partitioned on node id,
  * so consecutive rounds reuse the same partitioning and AQE's skew-join
  * splitting applies to hub vertices. Lineage is truncated per round with
  * `localCheckpoint` (the [[Components]] discipline — without it round N
  * replans rounds 1..N-1 on every action).
  */
object Graph {

  /** Undirected view of a directed edge list: both orientations, self-loops
    * dropped, exact duplicates merged. One shuffle (the distinct). */
  def symmetrize(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Fixed-iteration PageRank on a DIRECTED edge list (symmetrize first for
    * undirected graphs). pr_{t+1}(v) = (1-d)/N + d * Σ_{u→v} pr_t(u)/out(u),
    * seeded uniform at 1/N over every node that appears in an edge. Sink
    * nodes (out-degree 0) keep the teleport term only and their mass is not
    * redistributed — the standard simplified formulation; on a symmetrized
    * graph there are no sinks and Σ pr = 1.
    *
    * Each iteration: edges ⋈ ranks on src (hash-partitioned on src), then a
    * sum aggregate keyed by dst — partial aggregation combines map-side, so
    * the exchange carries one row per (partition, dst), and a hub vertex's
    * fan-in is reduced before the shuffle rather than materialized in one
    * task. Iteration count is a parameter, not convergence-tested: a fixed
    * unrollable plan is what makes the result exactly reproducible (and
    * SQL-oracle-able) — production rank pipelines run 10-20 rounds.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"pageRank: damping must be in (0,1), got $damping")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    var pr = nodes.select(col("id"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(out, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("pr") / col("outdeg")).as("contrib"))
      pr = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("id"), col("pr").as("pagerank"))
  }

  /** Bounded-hop BFS: minimum hop count from any seed to every node within
    * `maxHops`, on a DIRECTED edge list (symmetrize first for undirected).
    * Returns (id, hops) with hops 0 for the seeds themselves; nodes farther
    * than `maxHops` are absent. The frontier contraction is the scale story:
    * each round joins EDGES against only the newest frontier (not the whole
    * reached set), and the anti-join keeps the frontier from revisiting —
    * on a 100 TB graph the per-round cost tracks the frontier's edge
    * boundary, not the graph. Early-exits when the frontier empties.
    */
  def minHops(
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int,
      srcCol: String = "src",
      dstCol: String = "dst",
      seedCol: String = "id"): DataFrame = {
    require(maxHops >= 0, s"minHops: maxHops must be >= 0, got $maxHops")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    var reached = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("hops", lit(0))
      .localCheckpoint()
    var frontier = reached.select("id")
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      h += 1
      val next = e.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(reached, Seq("id"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint()
      if (next.isEmpty) exhausted = true
      else {
        reached = reached.union(next).localCheckpoint()
        frontier = next.select("id")
      }
    }
    reached
  }

  /** Global triangle count over a CANONICAL edge list (src < dst, deduped —
    * [[symmetrize]] output filtered to one orientation, or any a<b pair
    * set). Each triangle a<b<c is counted exactly once via the two-join
    * wedge closure: (a,b) ⋈ (b,c) builds wedges, (a,c) closes them. Both
    * joins hash-partition on a shared vertex; the canonical ordering halves
    * every posting list versus the symmetric form, and AQE splits the
    * skewed build sides a hub vertex produces. Returns one row
    * (n_triangles). */
  def triangleCount(canonicalEdges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = canonicalEdges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e1 = e.select(col("src").as("a"), col("dst").as("b"))
    val e2 = e.select(col("src").as("b"), col("dst").as("c"))
    val e3 = e.select(col("src").as("a"), col("dst").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
