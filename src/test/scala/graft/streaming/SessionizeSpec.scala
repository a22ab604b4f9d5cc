package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.StreamingOps.{Session, SessionEvent}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  private val gap = 1800L // 30 min

  private def events = Seq(
    (1L, ts("2025-08-29T10:00:00Z")),
    (1L, ts("2025-08-29T10:10:00Z")),  // same session
    (1L, ts("2025-08-29T10:40:00Z")),  // exactly 30 min gap → same session
    (1L, ts("2025-08-29T12:00:00Z")),  // new session
    (2L, ts("2025-08-29T10:05:00Z"))
  ).toDF("user_id", "ts")

  test("batch sessionization: gap rule, inclusive boundary, per-key isolation") {
    val got = StreamingOps.sessionizeBatch(events, "ts", "user_id", gap)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.toString,
        r.getTimestamp(2).toInstant.toString, r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "2025-08-29T10:00:00Z", "2025-08-29T10:40:00Z", 3L),
      (1L, "2025-08-29T12:00:00Z", "2025-08-29T12:00:00Z", 1L),
      (2L, "2025-08-29T10:05:00Z", "2025-08-29T10:05:00Z", 1L)))
  }

  test("streaming sessionization closes sessions via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val q = StreamingOps.sessionizeStream(mem.toDS(), gap, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    mem.addData(
      SessionEvent(1L, ts("2025-08-29T10:00:00Z")),
      SessionEvent(1L, ts("2025-08-29T10:10:00Z")))
    q.processAllAvailable()
    // advance the watermark far past last+gap → session 1 times out + emits
    mem.addData(SessionEvent(2L, ts("2025-08-29T13:00:00Z")))
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, ts("2025-08-29T13:01:00Z"))) // extra batch to flush timeouts
    q.processAllAvailable()
    val rows = spark.table("sess").as[Session].collect()
    q.stop()
    val u1 = rows.filter(_.user_id == 1L)
    assert(u1.length == 1)
    assert(u1.head.session_start == ts("2025-08-29T10:00:00Z"))
    assert(u1.head.session_end == ts("2025-08-29T10:10:00Z"))
    assert(u1.head.n_events == 2L)
  }

  test("streaming in-batch session split matches the batch form") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val q = StreamingOps.sessionizeStream(mem.toDS(), gap, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    // two sessions for one user arrive in ONE batch: the first closes inline
    mem.addData(
      SessionEvent(7L, ts("2025-08-29T08:00:00Z")),
      SessionEvent(7L, ts("2025-08-29T08:05:00Z")),
      SessionEvent(7L, ts("2025-08-29T09:30:00Z")))
    q.processAllAvailable()
    val closedInline = spark.table("sess2").as[Session].collect()
    q.stop()
    assert(closedInline.length == 1)
    assert(closedInline.head.n_events == 2L)
    assert(closedInline.head.session_end == ts("2025-08-29T08:05:00Z"))
  }
}
