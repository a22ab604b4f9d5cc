package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fixture-level behavior pins for the round-9 analytics additions
  * (`q_anomaly_zscore`, `q_pii_redact`, `q_degree_distribution`,
  * `q_markov_transitions` register the same shapes over the driver tables;
  * these specs plant inputs where the right answer is known by hand).
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling z-score flags a planted outlier and skips warm-up rows") {
    // 40 calm points (alternating 9.5/10.5 around 10) then one spike.
    val calm = (1 to 40).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        "t", if (i % 2 == 0) 10.5 else 9.5))
    val rows = calm :+ ((41L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:41"), "t", 50.0))
    val ev = rows.toDF("event_id", "ts", "event_type", "value")
    val frame = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
      .rowsBetween(-100, -1)
    val flagged = ev
      .withColumn("mu", avg($"value").over(frame))
      .withColumn("sigma", stddev_samp($"value").over(frame))
      .withColumn("nprev", count($"value").over(frame))
      .filter($"nprev" >= 30 && $"sigma" > 0 &&
        abs(($"value" - $"mu") / $"sigma") > 3)
      .select($"event_id").as[Long].collect().toSet
    assert(flagged === Set(41L)) // spike caught; nothing in the calm run
  }

  test("rolling z-score excludes the current row from its own baseline") {
    // With the current row INSIDE the frame a single huge value inflates
    // sigma enough to matter; the [-100,-1] frame keeps the baseline clean:
    // mu/sigma at the spike row must equal the calm-run statistics exactly.
    val rows = ((1 to 35).map(i => (i.toLong, i.toLong, "t", 10.0 + (i % 2))) :+
      ((36L, 36L, "t", 1000.0)))
    val ev = rows.toDF("event_id", "ord", "event_type", "value")
    val frame = Window.partitionBy($"event_type").orderBy($"ord")
      .rowsBetween(-100, -1)
    val atSpike = ev.withColumn("mu", avg($"value").over(frame))
      .filter($"event_id" === 36L).select($"mu").as[Double].head()
    val calmMean = (1 to 35).map(i => 10.0 + (i % 2)).sum / 35.0
    assert(math.abs(atSpike - calmMean) < 1e-12)
  }

  test("digit redaction masks every digit and counts masked chars") {
    val df = Seq(
      (1L, "Customer#000000001"),
      (2L, "no digits here"),
      (3L, "a1b22c333")).toDF("id", "name")
    val out = df.select($"id",
        regexp_replace($"name", "[0-9]", "*").as("masked"),
        (length($"name") - length(regexp_replace($"name", "[0-9]", "")))
          .cast("long").as("n_masked"))
      .orderBy($"id").as[(Long, String, Long)].collect()
    assert(out(0) === ((1L, "Customer#*********", 9L)))
    assert(out(1) === ((2L, "no digits here", 0L)))
    assert(out(2) === ((3L, "a*b**c***", 6L)))
  }

  test("degree distribution counts nodes per degree over undirected edges") {
    // Path 1-2-3 plus isolated edge 4-5: degrees 1,2,1,1,1 → {1:4, 2:1}.
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val deg = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .as[(Long, Long)].collect().toMap
    assert(hist === Map(1L -> 4L, 2L -> 1L))
  }

  test("markov transition rows are row-normalized exact probabilities") {
    // user 1: a->b->a->b ; user 2: a->b. Transitions: a->b ×3, b->a ×1.
    val ev = Seq(
      (1L, 1L, 1L, "a"), (2L, 2L, 1L, "b"), (3L, 3L, 1L, "a"),
      (4L, 4L, 1L, "b"), (5L, 1L, 2L, "a"), (6L, 2L, 2L, "b"))
      .toDF("event_id", "ord", "user_id", "event_type")
    val w = Window.partitionBy($"user_id").orderBy($"ord", $"event_id")
    val bi = ev.withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = bi.groupBy("from_type").agg(sum("n").as("row_n"))
    val out = bi.join(tot, "from_type")
      .select($"from_type", $"to_type", $"n",
        round($"n".cast("double") / $"row_n", 6).as("p"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out === Map(
      ("a", "b") -> ((3L, 1.0)),
      ("b", "a") -> ((1L, 1.0))))
  }
}
