package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CentroidAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("centroid equals the posexplode/avg reference across partitions") {
    val vecs = (0 until 100).map { i =>
      (i % 3, Array.tabulate(4)(j => (i * 7 + j).toDouble))
    }.toDF("label", "vec").repartition(5) // force multi-partition merge
    val cent = CentroidAggregator.centroid(4)
    val got = vecs.groupBy($"label").agg(cent($"vec").as("c"))
      .select($"label", $"c").as[(Int, Seq[Double])].collect()
      .map { case (l, c) => l -> c }.toMap
    val ref = vecs.select($"label", posexplode($"vec").as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"m"))),
        e => e.getField("m")).as("c"))
      .select($"label", $"c").as[(Int, Seq[Double])].collect()
      .map { case (l, c) => l -> c }.toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (l, c) =>
      c.zip(ref(l)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("null and empty vectors are ignored; all-null group yields null") {
    val vecs = Seq(
      (0, Array(2.0, 4.0)), (0, null),
      (1, null)
    ).toDF("label", "vec")
    val cent = CentroidAggregator.centroid(2)
    val got = vecs.groupBy($"label").agg(cent($"vec").as("c"))
      .orderBy("label").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 4.0)) // count excludes nulls
    assert(got(1).isNullAt(1))
  }

  test("plans as a two-phase hash aggregate (partial + final)") {
    val vecs = Seq((0, Array(1.0))).toDF("label", "vec")
    val cent = CentroidAggregator.centroid(1)
    val plan = vecs.groupBy($"label").agg(cent($"vec"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_centroidaggregator") ||
      plan.toLowerCase.contains("partial"))
  }
}
