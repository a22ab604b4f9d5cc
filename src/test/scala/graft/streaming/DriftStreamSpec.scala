package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingOps.DriftVec
import org.apache.spark.sql.functions._

/** The streaming drift monitor must report exactly what the oracled batch
  * entry (`q_embedding_drift`) reports — same (label, dim) rows, same means
  * to the bit — no matter how micro-batches slice the vectors, because the
  * shared transform keeps only integer sums/counts as state. Also pins the
  * scale contract: state rows = |labels| × dims, independent of how many
  * vectors streamed through.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Two labels × two parity cohorts with a planted mean shift on label
    * "b": even vectors sit near +2, odd near -1, so drift ≈ 3 on every
    * dim; label "a" has no shift. Components vary with id so quantization
    * actually rounds. */
  private def fixture: Seq[DriftVec] = (0L until 48L).map { i =>
    val label = if (i % 4 < 2) "a" else "b"
    val base = if (label == "b" && i % 2 == 0) 2.0 else if (label == "b") -1.0 else 0.5
    DriftVec(label, i, Seq.tabulate(8)(j => base + math.sin(i * 7 + j) * 0.3))
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getInt(1)) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))

  private def batchReference: Map[(String, Int), (Double, Double, Double)] =
    StreamingOps.embeddingDrift(fixture.toDF()).collect().map(key).toMap

  private def runStream(batches: Seq[Seq[DriftVec]]): Map[(String, Int), (Double, Double, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DriftVec]
    val name = s"drift_${System.nanoTime()}"
    val q = StreamingOps.embeddingDrift(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).collect()
    q.stop()
    rows.map(key).toMap
  }

  test("single micro-batch: stream state equals the batch report exactly") {
    val ref = batchReference
    assert(ref.nonEmpty && ref.keys.map(_._1).toSet == Set("a", "b"))
    // the planted shift is visible: every label-b dim drifts by ~3
    assert(ref.collect { case (("b", _), (_, _, d)) => d }.forall(d => d > 2.0))
    assert(runStream(Seq(fixture)) == ref)
  }

  test("trickled micro-batches: same report bit-for-bit; state stays |labels|x dims") {
    val ref = batchReference
    val out = runStream(fixture.grouped(7).toSeq)
    assert(out == ref)
    assert(out.size == 2 * 8, "state rows must be label-domain x dims, not stream-length")
  }
}
