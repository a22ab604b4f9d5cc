package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorDistancesSpec extends SparkSpec {
  import spark.implicits._
  import VectorDistances._

  private def pairs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.0, 0.0), Seq(0.0, 0.0)),
    (Seq(1.5), Seq(-2.0))
  ).toDF("a", "b")

  test("dot product and l2 match the HOF composition bit for bit") {
    val hofDot = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val hofL2 = sqrt(aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, v) => s + v))
    val rows = pairs.select(
      dot_product($"a", $"b") === hofDot,
      l2_distance($"a", $"b") === hofL2).collect()
    assert(rows.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("known values; null input → null; mismatched lengths use common prefix") {
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(dot_product($"a", $"b"), l2_distance($"a", $"b")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(27.0)) < 1e-12)
    val n = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
      .select(dot_product($"a", $"b")).head()
    assert(n.isNullAt(0))
    val m = Seq((Seq(1.0, 9.0), Seq(2.0))).toDF("a", "b")
      .select(dot_product($"a", $"b")).head()
    assert(m.getDouble(0) == 2.0) // common prefix only
  }

  test("participates in whole-stage codegen") {
    // range source: a local relation would constant-fold the projection away
    val q = spark.range(100).select(
        array($"id".cast("double"), ($"id" * 2).cast("double")).as("a"),
        array(($"id" + 1).cast("double"), ($"id" - 1).cast("double")).as("b"))
      .select(dot_product($"a", $"b").as("d"), l2_distance($"a", $"b").as("l"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
    assert(!plan.toLowerCase.contains("fallback"), plan)
  }
}
