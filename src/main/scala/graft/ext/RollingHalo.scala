package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe bounded-PRECEDING rolling-frame aggregates.
  *
  * A window `PARTITION BY key ORDER BY ord ROWS BETWEEN F PRECEDING AND 1
  * PRECEDING` puts each key's ENTIRE timeline in one task; with a
  * low-cardinality key (event types, tenant tiers) that is a full-corpus
  * sort on a handful of cores at 100 TB — the same failure class as an
  * unpartitioned window, just hidden behind a 5-value partition column.
  * A bounded frame, though, only ever reaches F rows back, so the timeline
  * splits into coarse time buckets (calendar days here) processed as
  * independent window partitions — provided each bucket also sees the
  * up-to-F rows that precede it, a "halo" copied in from earlier buckets'
  * tails. Halo rows participate in frames but are dropped before emit.
  *
  * The output is BITWISE identical to the naive single-partition window:
  * each row's frame holds exactly the same rows in the same (ts, id)
  * order, and Spark's sliding-frame evaluation folds the aggregate over
  * frame contents in row order, so even the floating-point sums match —
  * swapping the naive window for this decomposition cannot move a hash
  * oracle.
  *
  * Why per-bucket last-F tails suffice even when buckets are sparse: a
  * row that is NOT among the last F of its own bucket is shadowed by ≥ F
  * later rows in that same bucket, so it can never be within the last F
  * preceding any later bucket. Ranking the pooled tails per target bucket
  * therefore recovers the exact last-F-before-bucket set, even when those
  * F rows span many near-empty buckets.
  *
  * Cost model at scale: the big table is touched by (a) one window
  * partitioned by (key, bucket) — bounded partitions, massively parallel —
  * and (b) the per-bucket tail extraction, the same bounded window. The
  * halo build runs on the tails table alone: ≤ F × buckets × keys rows,
  * constants independent of data volume, so its range join + rank stay
  * negligible no matter how large the input grows.
  */
object RollingHalo {

  /** Adds `mu` / `sigma` / `nprev` = avg / stddev_samp / count of
    * `valueCol` over `ROWS BETWEEN frame PRECEDING AND 1 PRECEDING`,
    * partitioned by `keyCol`, ordered by (`tsCol`, `idCol`) — the
    * rolling-baseline shape of z-score anomaly detection — computed via
    * the day-bucket + halo decomposition above. Same rows, same columns,
    * same values as the naive `Window.partitionBy(keyCol)` plan.
    */
  def precedingStats(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, frame: Int = 100): DataFrame = {
    require(frame > 0, "frame must be positive")
    val bucketed = df.withColumn("__bucket", to_date(col(tsCol)))

    // Last `frame` rows of each (key, bucket) — the only rows any later
    // bucket can see (shadowing argument above).
    val tailRank = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val tails = bucketed
      .withColumn("__rnd", row_number().over(tailRank))
      .filter(col("__rnd") <= frame)
      .drop("__rnd")

    // Per-(key, bucket) tail counts with running totals over the bucket
    // axis — metadata-sized (≤ one row per bucket per key, independent of
    // data volume). `__cum_after` = tail rows in strictly later buckets;
    // a target bucket's at-or-after total is `__cum_after + __cnt`.
    val cnts = tails.groupBy(col(keyCol), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
    val laterW = Window.partitionBy(col(keyCol)).orderBy(col("__bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val meta = cnts.withColumn("__cum_after",
      coalesce(sum(col("__cnt")).over(laterW), lit(0L)))
    val srcTails = tails.join(
      meta.select(col(keyCol), col("__bucket"), col("__cum_after")),
      Seq(keyCol, "__bucket"))

    // Renamed key sidesteps Spark's self-join lineage ambiguity (a
    // tails(keyCol) === buckets(keyCol) condition resolves both sides to
    // the SAME attribute → trivially true, silently joining across keys).
    // Every bucket with rows contributes ≥ 1 tail row, so `meta` carries
    // the full (key, bucket) set.
    val buckets = meta.select(col(keyCol).as("__tgt_key"),
      col("__bucket").as("__tgt"),
      (col("__cum_after") + col("__cnt")).as("__tgt_cum"))

    // Halo of target bucket t = latest `frame` rows among tails of all
    // strictly earlier buckets. Runs entirely on the tiny tails table, and
    // the candidate set is PRUNED before ranking: a source bucket b with
    // ≥ `frame` tail rows in buckets strictly between b and t
    // (`__cum_after(b) − __tgt_cum(t) ≥ frame` — every one of them sorts
    // after all of b's rows) is shadowed and can never reach t's top
    // `frame`, so each target joins only the nearest contributing buckets:
    // O(F·B) tail-join output per key instead of O(F·B²) in bucket count B.
    val halo = srcTails.join(buckets,
        col(keyCol) === col("__tgt_key") && col("__bucket") < col("__tgt") &&
          col("__cum_after") - col("__tgt_cum") < frame)
      .drop("__tgt_key", "__cum_after", "__tgt_cum")
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col(keyCol), col("__tgt"))
          .orderBy(col(tsCol).desc, col(idCol).desc)))
      .filter(col("__rnk") <= frame)
      .drop("__rnk", "__bucket")
      .withColumnRenamed("__tgt", "__bucket")
      .withColumn("__emit", lit(false))

    // Augmented (key, bucket) partitions: a bucket's own rows plus its
    // halo. The frame can never reach past the halo, because the halo is
    // min(frame, all-preceding) rows deep by construction.
    val w = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-frame, -1)
    bucketed.withColumn("__emit", lit(true))
      .unionByName(halo)
      .withColumn("mu", avg(col(valueCol)).over(w))
      .withColumn("sigma", stddev_samp(col(valueCol)).over(w))
      .withColumn("nprev", count(col(valueCol)).over(w))
      .filter(col("__emit"))
      .drop("__emit", "__bucket")
  }
}
