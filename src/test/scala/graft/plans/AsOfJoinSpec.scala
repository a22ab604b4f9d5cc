package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades (left) / quotes (right) — the canonical as-of shape
  private def trades = Seq(
    ("A", 3L, 100.0), ("A", 7L, 101.0), ("A", 10L, 102.0),
    ("B", 5L, 200.0),
    ("C", 1L, 300.0) // key with no quotes at all
  ).toDF("sym", "t", "price")

  private def quotes = Seq(
    ("A", 2L, 99.5), ("A", 7L, 100.5), ("A", 9L, 101.5),
    ("B", 6L, 199.5), // after B's only trade → no match
    ("D", 1L, 0.0)    // key with no trades
  ).toDF("qsym", "qt", "bid")

  private def asof: DataFrame =
    AsOf.join(trades, quotes, leftOn = "t", rightOn = "qt",
      leftBy = Seq("sym"), rightBy = Seq("qsym"))

  test("backward as-of semantics: latest quote at or before each trade") {
    val got = asof.select("sym", "t", "qt", "bid")
      .orderBy("sym", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", 3L, 2L, 99.5),
      ("A", 7L, 7L, 100.5),   // tie: on <= is inclusive
      ("A", 10L, 9L, 101.5),
      ("B", 5L, null, null),  // only quote is later
      ("C", 1L, null, null))) // no quotes for key
  }

  test("matches a window-based reference implementation on random data") {
    val n = 500
    val l = spark.range(n).select(
      (col("id") % 7).cast("string").as("sym"),
      pmod(col("id") * 37 + 11, lit(1000)).as("t"),
      col("id").as("lid"))
    val r = spark.range(n).select(
      (col("id") % 7).cast("string").as("qsym"),
      pmod(col("id") * 53 + 5, lit(1000)).as("qt"),
      col("id").as("rid"))
      .dropDuplicates("qsym", "qt") // unique (key, time) keeps winners unique
    val got = AsOf.join(l, r, "t", "qt", Seq("sym"), Seq("qsym"))
      .select("lid", "rid")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet

    // reference: plain theta-join + row_number per left row
    val w = Window.partitionBy("lid").orderBy(col("qt").desc, col("rid").desc)
    val ref = l.join(r, col("sym") === col("qsym") && col("qt") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("lid", "rid")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(got == ref)
  }

  test("asymmetric side sizes under AQE: partition counts stay aligned") {
    // big left, tiny right — AQE would love to coalesce the small shuffle
    val l = spark.range(20000).select(
      (col("id") % 50).cast("string").as("sym"), col("id").as("t"), col("id").as("lid"))
    val r = spark.range(20).select(
      (col("id") % 50).cast("string").as("qsym"), (col("id") * 100).as("qt"), col("id").as("rid"))
    val out = AsOf.join(l, r, "t", "qt", Seq("sym"), Seq("qsym"))
    assert(out.count() == 20000) // every left row exactly once (left outer)
    // a key with a quote at t=0: rows with t >= 0 on sym where a quote exists
    val matched = out.filter(col("rid").isNotNull).count()
    assert(matched > 0)
  }

  test("physical plan is the custom exec with sort-merge movement") {
    val plan = asof.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"))
  }

  test("NULL by-keys and NULL on values never match (SQL equality semantics)") {
    // the DuckDB oracle `l.by = r.by AND l.on >= r.on` is never true through
    // a NULL; the merge must not let the natural row ordering equate NULLs
    val l = Seq(
      (Some("A"), Some(5L), 1L),
      (None: Option[String], Some(5L), 2L), // null by-key
      (Some("A"), None: Option[Long], 3L)   // null on
    ).toDF("sym", "t", "lid")
    val r = Seq(
      (Some("A"), Some(1L), 10L),
      (None: Option[String], Some(1L), 11L), // null by-key on the right
      (Some("A"), None: Option[Long], 12L)   // null on on the right
    ).toDF("qsym", "qt", "rid")
    val got = AsOf.join(l, r, "t", "qt", Seq("sym"), Seq("qsym"))
      .select("lid", "rid")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got(1L) == 10L) // normal match
    assert(got(2L) == -1L) // null by-key: no match, even though rid=11 has null key too
    assert(got(3L) == -1L) // null on: no match, even though rid=12 has null qt
  }

  test("filter above the as-of join pushes into the left child and mirrors by-keys right") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val filtered = asof.filter(col("sym") === "A" && col("price") > 100.0)
    val optimized = filtered.queryExecution.optimizedPlan
    // no Filter remains ABOVE the join…
    assert(!optimized.isInstanceOf[LFilter], optimized.toString)
    val j = optimized.collectFirst { case p: AsOfJoinPlan => p }.get
    // …both conjuncts pushed into the left child, by-key mirrored right.
    // With GraftExtensions active the pushdown runs inside the main
    // optimizer batches, so ConvertToLocalRelation may already have
    // collapsed the pushed Filter into a pruned LocalRelation — either
    // shape proves the predicate landed below the join.
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
    def pushedInto(p: LogicalPlan, origRows: Int): Boolean =
      p.collectFirst { case f: LFilter => f }.isDefined ||
        p.collectFirst { case lr: LocalRelation => lr }.exists(_.data.size < origRows)
    assert(pushedInto(j.left, 5), s"left not filtered:\n${j.left}")
    assert(pushedInto(j.right, 5), s"right not filtered:\n${j.right}")

    // semantics unchanged: same rows as filtering the unoptimized result
    val expect = asof.collect().filter(r =>
      r.getString(0) == "A" && r.getDouble(2) > 100.0).map(_.toSeq).toSet
    assert(filtered.collect().map(_.toSeq).toSet == expect)
  }

  test("non-left-only predicates stay above the join (right-side nullable cols)") {
    val filtered = asof.filter(col("bid").isNotNull)
    // right-side reference: must NOT push below a left-outer as-of join
    val j = filtered.queryExecution.optimizedPlan
      .collectFirst { case p: AsOfJoinPlan => p }.get
    assert(j.right.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty)
    assert(filtered.count() == 3) // A's three trades; B's quote is later, C has none
  }

  test("registration via SparkSessionExtensions class compiles into a session") {
    // the production wiring path; the shared test session uses lazy
    // registration instead, so just exercise the injector.
    val ext = new GraftExtensions
    val builder = org.apache.spark.sql.SparkSession.builder()
    builder.withExtensions(ext) // must not throw
  }
}
