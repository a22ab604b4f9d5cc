package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Battery-wide plan invariant: NO registered query may plan an
  * unpartitioned window. `Window.orderBy(...)` without a partitionBy funnels
  * the whole input through one task — the classic silent scale-killer that
  * works fine at test scale and falls over at 100 TB. Every ranking /
  * running-sum in the battery must either partition its window (shards,
  * groups) or use a bounded aggregate (TopKAggregate, TakeOrdered).
  */
class WindowAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans an unpartitioned window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // optimizedPlan = analyzed + optimized, never executed (index-build
        // side effects of a few eager queries run at sf0.001 — cheap)
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val global = plan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries with a global (unpartitioned) window: ${offenders.mkString(", ")}")
  }
}
