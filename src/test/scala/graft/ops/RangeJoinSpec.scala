package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the theta join on random integer data") {
    val points = spark.range(300).select(
      col("id").as("pid"), pmod(col("id") * 37, lit(100)).as("p"))
    val intervals = spark.range(40).select(
      col("id").as("iid"),
      pmod(col("id") * 13, lit(90)).as("lo"),
      (pmod(col("id") * 13, lit(90)) + pmod(col("id"), lit(15))).as("hi"))
    for (w <- Seq(1L, 4L, 64L)) {
      val binned = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val theta = points.join(intervals, col("lo") <= col("p") && col("p") < col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == theta, s"binWidth=$w")
    }
  }

  test("half-open boundaries: lo included, hi excluded; empty intervals drop") {
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "p")
    val intervals = Seq((1L, 10L, 20L), (2L, 30L, 30L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 7)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // 20 excluded (hi), empty [30,30) matches nothing
  }

  test("intervalOverlap equals the theta join; each pair emitted exactly once") {
    val a = spark.range(60).select(
      col("id").as("aid"),
      pmod(col("id") * 17, lit(80)).as("lo_a"),
      (pmod(col("id") * 17, lit(80)) + pmod(col("id") * 7, lit(25))).as("hi_a"))
    val b = spark.range(45).select(
      col("id").as("bid"),
      pmod(col("id") * 11, lit(80)).as("lo_b"),
      (pmod(col("id") * 11, lit(80)) + pmod(col("id") * 3, lit(30))).as("hi_b"))
    val theta = a.join(b, col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    for (w <- Seq(1L, 5L, 100L)) {
      // collect as a LIST: any pair emitted per shared bin instead of once
      // would appear here as a duplicate and fail the size check
      val got = RangeJoin.intervalOverlap(a, "lo_a", "hi_a", b, "lo_b", "hi_b", w)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == theta.length, s"binWidth=$w: dup or missing pairs")
      assert(got.toSet == theta.toSet, s"binWidth=$w")
    }
  }

  test("intervalOverlap equiKeys restrict pairs to matching key groups") {
    val a = Seq(("x", 1L, 0L, 10L), ("y", 2L, 0L, 10L)).toDF("k", "aid", "lo_a", "hi_a")
    val b = Seq(("x", 7L, 5L, 6L), ("y", 8L, 20L, 30L)).toDF("k", "bid", "lo_b", "hi_b")
    val got = RangeJoin.intervalOverlap(a, "lo_a", "hi_a", b, "lo_b", "hi_b", 4, Seq("k"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L))) // y's intervals don't overlap; no cross-key pair
  }

  test("plans as an equi-join on the bin, not a nested-loop join") {
    val points = spark.range(10).select(col("id").as("p"))
    val intervals = spark.range(5).select(col("id").as("lo"), (col("id") + 2).as("hi"))
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Join") || plan.contains("join"))
  }
}
