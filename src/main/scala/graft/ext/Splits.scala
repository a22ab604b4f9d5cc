package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The canonical train/val/test assignment rule shared by the batch
  * splitter (`q_leakage_split`), the incremental assigner
  * (`q_split_ingest`), and the streaming ingest gate
  * ([[graft.streaming.StreamingOps.startSplitIngest]]): ~80/10/10 from two
  * md5 nibbles of the canonical cluster id (204/26/26 of 256). One rule,
  * one hash domain — so an incremental assignment agrees with what a
  * from-scratch re-split would produce for the same cluster, and the
  * DuckDB oracle can mirror it with strpos arithmetic. */
object Splits {

  /** Split for a cluster's canonical id (any integral column). */
  def splitOf(clusterId: Column): Column = {
    val bucket = conv(
      substring(md5(concat(lit("split:"), clusterId.cast("string"))), 1, 2),
      16, 10).cast("int")
    when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
  }
}
