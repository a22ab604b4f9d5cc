package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, triangles, and singleton edges all collapse to min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),        // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (12L, 10L),  // triangle
      (21L, 20L)                           // pair
    ).toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path needs multiple propagation rounds and still converges") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(edges, maxLocalEdges = 0) // force distributed
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.values.toSet == Set(1L)) // one component, labeled by min id
  }

  test("pointer jumping: a 300-link chain converges in O(log n) rounds") {
    // plain min-propagation would need ~300 rounds; with path compression
    // the default maxIters = 20 is ample (≈ 2·log2(300) ≈ 17 worst case)
    val n = 300
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val res = Components.connectedComponentsWithStats(edges, maxLocalEdges = 0) // force distributed
    val got = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.toSet == Set(1L))
    assert(res.rounds <= 17,
      s"expected O(log n) convergence, took ${res.rounds} rounds")
  }

  test("round count is returned and small for typical dup-pair graphs") {
    val edges = Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("src", "dst")
    val res = Components.connectedComponentsWithStats(edges, maxLocalEdges = 0) // distributed
    res.labels.collect()
    assert(res.rounds >= 1 && res.rounds <= 2,
      s"pair clusters must converge immediately, took ${res.rounds}")
  }

  test("local union-find path (under the edge gate) matches the distributed path") {
    val rnd = new scala.util.Random(11)
    // random sparse graph: 120 nodes, 90 edges -> many nontrivial components
    val edges = (0 until 90)
      .map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .toDF("src", "dst")
    val local = Components.connectedComponentsWithStats(edges) // under gate -> local
    assert(local.rounds == 0, "expected the bounded local path")
    val dist = Components.connectedComponentsWithStats(edges, maxLocalEdges = 0)
    assert(dist.rounds >= 1, "expected the distributed path")
    val lm = local.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dm = dist.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm == dm)
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("an empty edge set yields an empty labeling (dedup's no-duplicates path)") {
    // dedup/dedupDelta feed whatever pairs survive the threshold straight
    // in; a clean corpus means ZERO edges and every caller then expects
    // "no rows" = "everyone keeps" — pin that the empty frame round-trips
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Components.connectedComponents(edges).count() == 0L)
  }
}
