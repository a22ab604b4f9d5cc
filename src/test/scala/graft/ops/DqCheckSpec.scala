package graft.ops

import graft.SparkSpec

class DqCheckSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1.0), Some("a")),
    (None, Some("b")),
    (Some(500.0), None),
    (None, None) // fully null
  ).toDF("v", "s")

  test("one-pass report evaluates every rule with correct metrics") {
    val rep = DqCheck.report(df, Seq(
        DqCheck.rowCount(min = 3),
        DqCheck.noFullyNullRows(Seq("v", "s")),
        DqCheck.maxNullFraction("v", 0.6),
        DqCheck.valuesInRange("v", 0, 100)))
      .orderBy("rule")
      .as[(String, Double, Boolean)].collect().toSeq
    assert(rep == Seq(
      ("fully_null_rows", 1.0, false),   // the (None, None) row
      ("null_fraction_v", 0.5, true),    // 2 of 4 null, bound 0.6
      ("out_of_range_v", 1.0, false),    // 500 outside [0, 100]
      ("row_count", 4.0, true)))
  }

  test("the report is a single aggregation (one scan, no per-rule jobs)") {
    val plan = DqCheck.report(df, Seq(
        DqCheck.rowCount(), DqCheck.maxNullFraction("v", 0.5)))
      .queryExecution.executedPlan.toString
    // exactly one aggregate pair (partial+final) over one scan
    assert("HashAggregate|SortAggregate".r.findAllIn(plan).size <= 2)
  }

  test("duplicateKeys surfaces init.sql:47-52 duplicates") {
    val d = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "t")
    val dups = DqCheck.duplicateKeys(d, Seq("k", "t")).collect()
    assert(dups.length == 1 && dups.head.getString(0) == "a")
  }
}
