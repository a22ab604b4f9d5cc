package graft.functions

import graft.SparkSpec
import graft.ext.Similarity
import graft.functions.CosineSimilarity.cosine_similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("matches the higher-order-function composition bit for bit") {
    val vecs = (0 until 200).map { i =>
      (Array.tabulate(32)(j => math.sin(i * 31 + j).toFloat),
       Array.tabulate(32)(j => math.cos(i * 17 + j).toFloat))
    }.toDF("a", "b")
    val hof = Similarity.dot(Similarity.asDouble($"a"), Similarity.asDouble($"b")) /
      (Similarity.norm(Similarity.asDouble($"a")) * Similarity.norm(Similarity.asDouble($"b")))
    val diffs = vecs.select(
        cosine_similarity($"a", $"b").as("native"), hof.as("ref"))
      .filter($"native" =!= $"ref")
    assert(diffs.isEmpty)
  }

  test("known values, zero-vector → null, null input → null") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal → 0
      (Array(3.0, 4.0), Array(3.0, 4.0)),   // identical → 1
      (Array(1.0, 2.0), Array(0.0, 0.0)),   // zero norm → null
      (null, Array(1.0, 2.0))               // null input → null
    ).toDF("a", "b")
    val out = df.select(cosine_similarity($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
    assert(out(2).isNullAt(0))
    assert(out(3).isNullAt(0))
  }

  test("participates in whole-stage codegen (no fallback in the plan)") {
    // non-foldable input (literals would be constant-folded to a LocalTableScan)
    val vecs = spark.range(10).select(
      array($"id".cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), $"id".cast("double")).as("b"))
    val plan = vecs.select(cosine_similarity($"a", $"b").as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [cosine_similarity"))
    // and it computes through the generated path
    assert(vecs.select(cosine_similarity($"a", $"b")).count() == 10)
  }

  test("mismatched lengths truncate both vectors to the common prefix") {
    val df = Seq((Array(1.0, 0.0, 9.9), Array(1.0, 0.0))).toDF("a", "b")
    // both dot and norms run over the 2-element prefix → exactly 1.0
    val c = df.select(cosine_similarity($"a", $"b")).as[Double].head()
    assert(c == 1.0)
  }
}
