package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the join-side counterpart of
  * [[SkewAgg]]: when a handful of hot keys dominate the big side, a plain
  * shuffle join lands each hot key on ONE reducer. Salting appends a
  * deterministic salt in [0, salts) to the big side's key and replicates
  * the small side once per salt value, so each hot key spreads across
  * `salts` reducers while every (key, salt) pair still finds its match.
  *
  * The small side grows ×salts — use only when it is dimension-sized
  * (if it broadcasts, prefer `broadcast()`; salting targets the middle
  * ground: too big to broadcast, joined against a skewed fact). AQE's
  * skew-join split handles sort-merge spills adaptively; explicit salting
  * is the deterministic tool when the skew is known and extreme, or when
  * the join feeds an aggregation that must itself be salted.
  */
object SkewJoin {

  /** Inner equi-join on same-named `keys`, salted `salts` ways. The salt is
    * derived from the big side's full row hash — deterministic, no RNG. */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    require(keys.nonEmpty && salts > 0)
    val bigCols = big.columns.toSeq.map(col)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(bigCols: _*)), lit(salts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    // Pin a SHUFFLED hash join (small side builds): salting only means
    // anything when both sides shuffle on (key, salt) — at test scale the
    // optimizer would otherwise notice either side fits a broadcast and
    // silently plan the one join shape salting exists to replace.
    salted.join(replicated.hint("shuffle_hash"), keys :+ "_salt").drop("_salt")
  }
}
