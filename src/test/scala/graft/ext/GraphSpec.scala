package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("symmetrize dedups, drops self-loops, and emits both orientations") {
    val sym = Graph.symmetrize(edges(1L -> 2L, 2L -> 1L, 1L -> 2L, 3L -> 3L))
      .as[(Long, Long)].collect().toSet
    assert(sym == Set((1L, 2L), (2L, 1L)))
  }

  test("pageRank on a symmetric star matches the hand-unrolled recurrence") {
    // star a=1 hub, leaves 2,3; symmetric => no sinks, mass conserved
    val sym = Graph.symmetrize(edges(1L -> 2L, 1L -> 3L))
    val pr = Graph.pageRank(sym, iters = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    // hand-unroll: n=3, out(1)=2, out(2)=out(3)=1; t = teleport = 0.05
    var h = 1.0 / 3; var l = 1.0 / 3
    for (_ <- 1 to 3) {
      val nh = 0.05 + 0.85 * (l + l) // hub receives both leaves (outdeg 1)
      val nl = 0.05 + 0.85 * (h / 2) // each leaf receives half the hub
      h = nh; l = nl
    }
    assert(math.abs(pr(1L) - h) < 1e-12 && math.abs(pr(2L) - l) < 1e-12)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, "mass conserved on symmetric graph")
  }

  test("pageRank directed sink keeps teleport share only") {
    // 1 -> 2: node 2 is a sink; its rank never flows anywhere
    val pr = Graph.pageRank(edges(1L -> 2L), iters = 2, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    // n=2: pr1(1)=0.075, pr1(2)=0.075+0.85*0.5; pr2(1)=0.075 (no in-edges)
    assert(math.abs(pr(1L) - 0.075) < 1e-12)
    assert(math.abs(pr(2L) - (0.075 + 0.85 * 0.075)) < 1e-12)
  }

  test("minHops finds true BFS distances and stops at maxHops") {
    // path 1-2-3-4-5 plus disconnected 10-11
    val sym = Graph.symmetrize(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 10L -> 11L))
    val seeds = Seq(1L).toDF("id")
    val hops = Graph.minHops(sym, seeds, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(hops == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("minHops takes the minimum over multiple seeds and early-exits") {
    val sym = Graph.symmetrize(edges(1L -> 2L, 2L -> 3L))
    val hops = Graph.minHops(sym, Seq(1L, 3L).toDF("id"), maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(hops == Map(1L -> 0, 3L -> 0, 2L -> 1))
  }

  test("triangleCount counts each triangle once on canonical edges") {
    // K4 on {1,2,3,4} has 4 triangles; extra pendant edge adds none
    val k4 = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 9L)
    assert(Graph.triangleCount(k4).as[Long].head() == 4L)
    assert(Graph.triangleCount(edges(1L -> 2L)).as[Long].head() == 0L)
  }
}
