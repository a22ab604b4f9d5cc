package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("merge of per-partition partials equals the direct aggregate") {
    val all = spark.range(10000).select(
      ($"id" % 7).cast("string").as("k"), ($"id" * 1.5).as("v"))
    val old = all.filter($"id" % 3 =!= 0).drop("id")
    val delta = all.filter($"id" % 3 === 0).drop("id")

    val merged = IncrementalAgg.finalized(IncrementalAgg.merge(Seq("k"),
      IncrementalAgg.partial(old, Seq("k"), "v"),
      IncrementalAgg.partial(delta, Seq("k"), "v")))
    val direct = IncrementalAgg.finalized(IncrementalAgg.partial(all, Seq("k"), "v"))

    val m = merged.orderBy("k").collect().map(_.toSeq).toSeq
    val d = direct.orderBy("k").collect().map(_.toSeq).toSeq
    assert(m == d)
  }

  test("merge is associative across three deltas") {
    val parts = (0 until 3).map(i =>
      spark.range(1000).filter($"id" % 3 === i)
        .select(($"id" % 5).cast("string").as("k"), $"id".cast("double").as("v")))
    val p = parts.map(IncrementalAgg.partial(_, Seq("k"), "v"))
    val left = IncrementalAgg.merge(Seq("k"), IncrementalAgg.merge(Seq("k"), p(0), p(1)), p(2))
    val flat = IncrementalAgg.merge(Seq("k"), p(0), p(1), p(2))
    assert(left.orderBy("k").collect().map(_.toSeq).toSeq ==
      flat.orderBy("k").collect().map(_.toSeq).toSeq)
  }
}
