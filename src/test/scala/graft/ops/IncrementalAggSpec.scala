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

  test("applyChanges maintains count/sum through appends AND an overwrite") {
    import org.apache.spark.sql.SaveMode
    import graft.sinks.Snapshots
    val t = java.nio.file.Files.createTempDirectory("graft-ivm").toString + "/t"
    def rows(r: (String, Double)*) = r.toSeq.toDF("k", "v")
    Snapshots.commit(rows(("a", 1.0), ("a", 2.0), ("b", 10.0)), t) // v1
    // bootstrap state from v1
    var state = IncrementalAgg.partial(Snapshots.read(spark, t, Some(1L)), Seq("k"), "v")
      .select($"k", $"n", $"sum_v")
    Snapshots.commit(rows(("b", 5.0), ("c", 7.0)), t) // v2 append
    state = IncrementalAgg.applyChanges(
      state, Snapshots.changes(spark, t, 1L, 2L), Seq("k"), "v")
    Snapshots.commit(rows(("a", 100.0)), t, SaveMode.Overwrite) // v3 drops a/b/c history
    state = IncrementalAgg.applyChanges(
      state, Snapshots.changes(spark, t, 2L, 3L), Seq("k"), "v")
    val expect = IncrementalAgg.partial(Snapshots.read(spark, t), Seq("k"), "v")
      .select($"k", $"n", $"sum_v")
    assert(state.orderBy("k").collect().map(_.toSeq).toSeq ==
      expect.orderBy("k").collect().map(_.toSeq).toSeq)
    // keys vanished by the overwrite (b, c) dropped out of the state
    assert(state.select("k").as[String].collect().toSeq == Seq("a"))
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
