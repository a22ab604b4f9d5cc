package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.StreamingOps.{ZAnomaly, ZEvent}
import org.apache.spark.sql.functions._

/** The streaming ring-buffer z-score must emit exactly the rows the oracled
  * batch window (`q_anomaly_zscore`'s RollingHalo form) flags — same ids,
  * same z to 4 decimals — both when all events arrive in one micro-batch
  * and when they trickle across several.
  */
class ZscoreStreamSpec extends SparkSpec {
  import spark.implicits._

  private val frame = 20
  private val minPrev = 10

  /** Planted fixture: per key, a stable baseline with two gross outliers.
    * One outlier sits inside the warm-up window (must NOT emit), one after
    * it (must emit); key "b" checks state isolation. */
  private def fixture: Seq[ZEvent] = {
    def mk(key: String, idBase: Long): Seq[ZEvent] = (1 to 60).map { i =>
      val v =
        if (i == 5) 500.0       // inside warm-up: never scored
        else if (i == 40) 300.0 // scored against a tight baseline → |z| >> 3
        else 10.0 + (i % 3)     // baseline wiggle keeps sigma > 0
      ZEvent(idBase + i, key,
        Timestamp.valueOf(f"2024-06-01 ${8 + i / 60}%02d:${i % 60}%02d:00"), v)
    }
    mk("a", 1000L) ++ mk("b", 2000L)
  }

  private def batchReference: Map[Long, Double] =
    graft.ext.RollingHalo
      .precedingStats(fixture.toDF(), "event_type", "ts", "event_id", "value",
        frame = frame)
      .filter($"nprev" >= minPrev && $"sigma" > 0 &&
        abs(($"value" - $"mu") / $"sigma") > 3)
      .select($"event_id", round(($"value" - $"mu") / $"sigma", 4).as("z"))
      .as[(Long, Double)].collect().toMap

  private def runStream(batches: Seq[Seq[ZEvent]]): Map[Long, Double] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ZEvent]
    val name = s"zs_${System.nanoTime()}"
    val q = StreamingOps
      .zscoreAnomaliesStream(mem.toDS(), frame = frame, minPrev = minPrev)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).as[ZAnomaly].collect()
    q.stop()
    rows.map(a => a.event_id -> BigDecimal(a.z)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  test("single micro-batch: stream emits exactly the batch window's anomalies") {
    val ref = batchReference
    assert(ref.nonEmpty, "fixture must plant at least one scored outlier")
    assert(ref.keySet == Set(1040L, 2040L),
      s"fixture sanity: post-warm-up outliers only, got ${ref.keySet}")
    assert(runStream(Seq(fixture)) == ref)
  }

  test("sub-millisecond timestamp ties fold in full-precision (ts, id) order") {
    // Two same-key events inside ONE millisecond, with ids OPPOSITE to
    // their microsecond order, and values chosen so each ordering yields
    // different baselines (the first-folded event never sees the second).
    // A millisecond-floored sort (Timestamp.getTime) would tie and fall
    // back to id order — the batch window's full-precision (ts, event_id)
    // sort is the contract, and RollingHalo provides the reference.
    val base = (1 to 35).map { i =>
      ZEvent(i.toLong, "a",
        Timestamp.valueOf(f"2024-06-02 08:${i % 60}%02d:00"), 10.0 + (i % 3))
    }
    val tied = Seq(
      ZEvent(101L, "a", Timestamp.valueOf("2024-06-02 09:00:00.000300"), 300.0),
      ZEvent(100L, "a", Timestamp.valueOf("2024-06-02 09:00:00.000500"), 12.0),
      ZEvent(102L, "a", Timestamp.valueOf("2024-06-02 09:01:00"), 250.0))
    val events = base ++ tied
    val ref = graft.ext.RollingHalo
      .precedingStats(events.toDF(), "event_type", "ts", "event_id", "value",
        frame = frame)
      .filter($"nprev" >= minPrev && $"sigma" > 0 &&
        abs(($"value" - $"mu") / $"sigma") > 3)
      .select($"event_id", round(($"value" - $"mu") / $"sigma", 4).as("z"))
      .as[(Long, Double)].collect().toMap
    assert(ref.contains(101L), "fixture sanity: the early-µs outlier must score")
    assert(runStream(Seq(events)) == ref)
  }

  private def runStreamOrdered(batches: Seq[Seq[ZEvent]]): Map[Long, Double] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ZEvent]
    val name = s"zso_${System.nanoTime()}"
    val q = StreamingOps
      .zscoreAnomaliesStreamOrdered(mem.toDS(), frame = frame, minPrev = minPrev,
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).as[ZAnomaly].collect()
    q.stop()
    rows.map(a => a.event_id -> BigDecimal(a.z)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  test("reorder buffer: adversarially shuffled arrival ≡ batch window") {
    // Deterministically shuffle BOTH keys' events across four micro-batches
    // (cross-batch arrival order violates event order everywhere, but stays
    // inside the 2 h watermark horizon, so nothing is dropped), then advance
    // the watermark past every real event with a sentinel on an unrelated
    // key — the held buffers flush via event-time timeout and must fold in
    // exact (ts, event_id) order.
    val shuffled = new scala.util.Random(42).shuffle(fixture)
    val batches = shuffled.grouped((shuffled.size + 3) / 4).toSeq
    val sentinel = ZEvent(9999L, "c", Timestamp.valueOf("2024-06-01 13:00:00"), 10.0)
    val ref = batchReference
    assert(runStreamOrdered(batches :+ Seq(sentinel)) == ref)
    // the reorder buffer is load-bearing: the plain in-arrival-order variant
    // gives a DIFFERENT (wrong) answer on the same shuffled arrival
    assert(runStream(batches) != ref,
      "fixture sanity: the shuffle must actually break arrival-order folding")
  }

  test("reorder buffer: beyond-horizon stragglers are dropped, never mis-folded") {
    // Batch 1 carries the full in-order fixture plus a sentinel that pushes
    // the watermark (2 h delay) past every real event. Batch 2 then delivers
    // a gross outlier whose event time is far BELOW the watermark — the
    // engine's late-data filter must discard it (the documented contract)
    // rather than fold it into a baseline that already moved past it.
    val byTime = fixture.sortBy(e => (e.ts.getTime, e.event_id))
    val sentinel = ZEvent(9997L, "c", Timestamp.valueOf("2024-06-01 13:00:00"), 10.0)
    // would be |z| >> 3 if folded — its absence from the output is the proof
    val straggler = ZEvent(7777L, "a", Timestamp.valueOf("2024-06-01 08:20:30"), 400.0)
    val flush = ZEvent(9996L, "c", Timestamp.valueOf("2024-06-01 15:00:00"), 10.0)
    val out = runStreamOrdered(Seq(byTime :+ sentinel, Seq(straggler, flush)))
    assert(!out.contains(7777L), "the straggler must be dropped, not scored")
    assert(out == batchReference, "surviving output must match the batch window")
  }

  test("reorder buffer: in-order arrival is the identity case") {
    val byTime = fixture.sortBy(e => (e.ts.getTime, e.event_id))
    val sentinel = ZEvent(9998L, "c", Timestamp.valueOf("2024-06-01 13:00:00"), 10.0)
    assert(runStreamOrdered(Seq(byTime, Seq(sentinel))) == batchReference)
  }

  test("multi-batch trickle: ring state carries the frame across micro-batches") {
    // split INSIDE the rolling frame of the scored outlier, so its baseline
    // spans the batch boundary — state must reconstruct it exactly
    val byTime = fixture.sortBy(e => (e.ts.getTime, e.event_id))
    val batches = Seq(
      byTime.filter(_.event_id % 1000 <= 35),
      byTime.filter(e => e.event_id % 1000 > 35 && e.event_id % 1000 <= 45),
      byTime.filter(_.event_id % 1000 > 45))
    assert(runStream(batches) == batchReference)
  }
}
