package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dup-cluster
  * operator: near-duplicate candidate pairs (MinHash/SimHash/LSH output)
  * form a graph, and each connected component is one duplicate cluster,
  * labeled by its minimum member id so a pipeline can keep one canonical
  * document per cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round a node takes the minimum label among itself
  * and its neighbors; fixpoint when no label changes. A component of
  * diameter D converges in ≤ D rounds. Per round the work is one shuffle
  * join (edges ⋈ labels on node id) plus a min aggregate — both partition
  * on node id, so consecutive rounds reuse the same hash partitioning.
  *
  * Scale notes: labels are truncated with `localCheckpoint` every round —
  * without it round N's plan nests rounds 1..N-1 and the job re-derives the
  * whole history each action. Real dup graphs are overwhelmingly small
  * clusters (pairs/triples), so rounds-to-converge is the max cluster
  * diameter, typically < 5; `maxIters` bounds pathological chains. (The
  * alternating large-star/small-star variant converges in O(log D) for
  * adversarial graphs; min-propagation is the right trade for dup-cluster
  * shapes.)
  */
object Components {

  /** Labeled components plus convergence observability: `rounds` is the
    * number of propagation rounds the distributed path ran (0 = the bounded
    * driver union-find served the call). Real dup graphs (pairs/triples)
    * converge in 1-2 rounds and pointer jumping bounds chains at
    * O(log diameter), so a high round count flags a pathological graph
    * before it becomes a runaway bench entry. Returned per call — no
    * process-global state, so concurrent calls each see their own count. */
  final case class Result(labels: DataFrame, rounds: Int)

  /** edges: two long-typed columns (src, dst), undirected (either
    * orientation). Returns (id, component): every node that appears in an
    * edge, labeled with the smallest node id in its component.
    *
    * HYBRID execution: a single bounded collect (limit `maxLocalEdges`+1)
    * probes the symmetrized-deduped edge list — when it fits the gate the
    * labels come from a driver-side union-find over the already-collected
    * edges (ONE job total; the same bounded-collect discipline as the ANN
    * index builds). Past the gate — the genuine 100 TB dup-graph case —
    * the distributed min-label propagation below takes over unchanged.
    * Dup graphs are edges among NEAR-DUPLICATES only, orders of magnitude
    * smaller than the corpus, so the gate is sized generously (2^20 edges
    * ≈ 125 MB of collected rows — bounded for any reasonable driver) and
    * the local path serves most real runs too. */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIters: Int = 20,
      maxLocalEdges: Long = 1L << 20): DataFrame =
    connectedComponentsWithStats(edges, srcCol, dstCol, maxIters, maxLocalEdges)
      .labels

  /** [[connectedComponents]] plus the per-call round count (see [[Result]]). */
  def connectedComponentsWithStats(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIters: Int = 20,
      maxLocalEdges: Long = 1L << 20): Result = {
    require(maxLocalEdges < Int.MaxValue, "maxLocalEdges must fit an Int limit")
    val symPlan = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

    // Gate probe = ONE bounded collect (limit gate+1), not a materialize +
    // count + collect chain: CollectLimit scans partitions incrementally, so
    // a small dup graph — the overwhelmingly common case — pays a single
    // job and the rows are already in hand for the union-find. Only a graph
    // that overflows the gate pays the probe again as the checkpoint scan.
    {
      val spark = edges.sparkSession
      import spark.implicits._
      val head = symPlan.as[(Long, Long)].limit(maxLocalEdges.toInt + 1).collect()
      if (head.length <= maxLocalEdges)
        return Result(localComponents(spark, head), rounds = 0)
    }
    val sym = symPlan.localCheckpoint()

    // seed each node with min(self, min direct neighbor) — this IS the
    // label state after a first propagation round against identity labels,
    // computed as one aggregate instead of a join round (round 1 would
    // otherwise join sym against labels that are known to be the identity)
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("m"))
      .select(col("id"), least(col("id"), col("m")).as("label"))
      .localCheckpoint()

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nbr_min"))
      val prop = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      // pointer jumping (path compression): additionally take my LABEL's
      // label — composing one hop through the label graph each round turns
      // O(diameter) convergence into O(log diameter), so long chains don't
      // need a round per link
      val byId = prop.select(col("id").as("jid"), col("label").as("jlabel"))
      val stepped = prop
        .join(byId, prop("label") === byId("jid"), "left")
        .select(prop("id"), prop("old_label"),
          least(prop("label"), coalesce(col("jlabel"), prop("label"))).as("label"))
        .localCheckpoint()
      changed = stepped.filter(col("label") =!= col("old_label")).count()
      labels = stepped.select("id", "label")
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIters rounds " +
          s"($changed labels still moving) — raise maxIters")
    Result(labels.select(col("id"), col("label").as("component")), i)
  }

  /** Driver-side union-find (path compression + union by rank) over a
    * BOUNDED edge set — exact same contract as the distributed path,
    * component = min member id. */
  private def localComponents(
      spark: org.apache.spark.sql.SparkSession,
      sym: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    val rank = scala.collection.mutable.HashMap.empty[Long, Int]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (la, lb) = (rank.getOrElse(ra, 0), rank.getOrElse(rb, 0))
        if (la < lb) parent(ra) = rb
        else if (la > lb) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = la + 1 }
      }
    }
    val nodes = scala.collection.mutable.LinkedHashSet.empty[Long]
    sym.foreach { case (s, d) => // bounded by the gate
      nodes += s; nodes += d
      union(s, d)
    }
    val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach { n =>
      val r = find(n)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
    }
    nodes.iterator.map(n => (n, minOfRoot(find(n)))).toSeq
      .toDF("id", "component")
  }
}
