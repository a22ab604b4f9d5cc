package graft

import graft.ext.RollingHalo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** The halo decomposition must be BITWISE interchangeable with the naive
  * per-key window it replaces (that equivalence is what lets
  * `q_anomaly_zscore` keep its hash oracle), and must never plan a window
  * partitioned by the low-cardinality key alone.
  */
class RollingHaloSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: DataFrame): DataFrame = {
    val w = W.partitionBy($"event_type").orderBy($"ts", $"event_id")
      .rowsBetween(-100, -1)
    df.withColumn("mu", avg($"value").over(w))
      .withColumn("sigma", stddev_samp($"value").over(w))
      .withColumn("nprev", count($"value").over(w))
  }

  private def halo(df: DataFrame): DataFrame =
    RollingHalo.precedingStats(df, "event_type", "ts", "event_id", "value")

  /** Bitwise double compare: NaN-safe, distinguishes nothing two equal
    * doubles differ on, catches any fold-order drift round() would hide. */
  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    def key(df: DataFrame) = df
      .select($"event_id", $"mu", $"sigma", $"nprev")
      .as[(Long, Option[Double], Option[Double], Long)].collect()
      .map { case (id, mu, sg, np) =>
        id -> ((mu.map(java.lang.Double.doubleToLongBits),
          sg.map(java.lang.Double.doubleToLongBits), np)) }
      .toMap
    val (ka, kb) = (key(a), key(b))
    assert(ka.keySet === kb.keySet)
    for ((id, va) <- ka) assert(va === kb(id), s"event_id=$id")
  }

  test("halo stats are bitwise identical on a sparse multi-day fixture") {
    // Day 1: 80 rows; days 2-4: 5 rows each (sparse — a 100-frame from
    // day 5 must reach through THREE near-empty buckets into day 1);
    // day 5: 60 rows. Also plants intra-day ts ties broken by event_id.
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, String, Double)]()
    var id = 0L
    def add(day: Int, n: Int): Unit = (1 to n).foreach { i =>
      id += 1
      // i/2 makes adjacent rows share a timestamp → tie-break by id matters
      rows += ((id, java.sql.Timestamp.valueOf(
        f"2024-03-0$day 0${(i / 2) / 60}%01d:${(i / 2) % 60}%02d:00"),
        if (id % 2 == 0) "a" else "b", math.sin(id.toDouble) * 10 + id % 7))
    }
    add(1, 80); add(2, 5); add(3, 5); add(4, 5); add(5, 60)
    // Key "c" exists ONLY on day 5: its halo there must be empty — a
    // cross-key join degeneracy would hand it rows from a/b instead.
    (1 to 10).foreach { i =>
      id += 1
      rows += ((id, java.sql.Timestamp.valueOf(f"2024-03-05 02:$i%02d:00"),
        "c", i.toDouble))
    }
    val df = rows.toSeq.toDF("event_id", "ts", "event_type", "value")
    assertSame(naive(df), halo(df))
  }

  test("halo pruning: many single-row buckets still reconstruct the exact frame") {
    // 130 consecutive days with ONE row each per key: every 100-frame pools
    // tails from the 100 nearest earlier buckets, so the shadow bound
    // (`cum_after − tgt_cum < frame`) sits exactly at the keep/prune edge
    // for bucket t−100 — an off-by-one in the pruning predicate would
    // either drop a contributing bucket (wrong stats) or keep a shadowed
    // one (caught by the rank, but then the bound isn't binding).
    val rows = (1 to 130).flatMap { day =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(day - 1L)
      Seq(
        (day * 2L, java.sql.Timestamp.valueOf(s"$date 10:00:00"), "a",
          math.cos(day.toDouble) * 5 + day % 11),
        (day * 2L + 1, java.sql.Timestamp.valueOf(s"$date 11:00:00"), "b",
          math.sin(day.toDouble) * 5 + day % 13))
    }
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    assertSame(naive(df), halo(df))
  }

  test("halo pruning: dense early buckets are shadowed without changing output") {
    // Two 150-row days then a sparse tail: day 3+ frames are fully served
    // by day 2's tail, so day 1 is shadowed for them — pruning must drop it
    // for those targets while keeping output identical.
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, String, Double)]()
    var id = 0L
    def add(day: Int, n: Int): Unit = (1 to n).foreach { i =>
      id += 1
      rows += ((id, java.sql.Timestamp.valueOf(
        f"2024-05-0$day ${i / 60}%02d:${i % 60}%02d:00"), "a",
        math.sin(id.toDouble) * 3 + id % 5))
    }
    add(1, 150); add(2, 150); add(3, 4); add(4, 4); add(5, 4)
    val df = rows.toSeq.toDF("event_id", "ts", "event_type", "value")
    assertSame(naive(df), halo(df))
  }

  test("halo stats are bitwise identical on the real events table") {
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    assertSame(naive(ev), halo(ev))
  }

  test("halo plan never windows row-scale data on the bare key") {
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = halo(ev).queryExecution.optimizedPlan
    // One exemption: the cumulative-tail-count window runs per key over the
    // (key, bucket) COUNT aggregate — one row per bucket, bounded by the
    // calendar span, never by data volume. Any other bare-key window sees
    // row-scale input and is the single-task scale-killer this guards.
    def overBucketMetadata(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
          overBucketMetadata(pr.child)
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.groupingExpressions.size >= 2
        case _ => false
      }
    val bare = plan.collect {
      case w: Window if w.partitionSpec.size < 2 && !overBucketMetadata(w.child) => w
    }
    assert(bare.isEmpty,
      "halo decomposition must partition every row-scale window by (key, bucket)")
  }
}
