package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregate — mergeable streaming quantiles with a
  * PROVEN rank-error bound (~1.65% at the default k=200, shrinking as
  * O(1/k)). The 100 TB percentile path: exact `percentile()` sorts every
  * group's values through a shuffle; this sketch keeps O(k log(n/k)) doubles
  * per (partition, group) partial and merges associatively, so the shuffle
  * carries kilobytes per group no matter how many rows fed it. (Spark's
  * built-in `percentile_approx` is the same tier via a different sketch —
  * KLL carries a formal error guarantee and cross-system compatibility via
  * the DataSketches serialized format.)
  *
  * Output: compact sketch bytes (`BinaryType`); read quantiles with
  * [[KllSketch.quantile]] / [[KllSketch.quantiles]] driver-side or via a
  * scalar call on the (few) aggregated rows.
  */
case class KllSketchAggregate(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAggregate =
    copy(child = newChildren(0))
  override def prettyName: String = "kll_sketch"
}

/** Scalar companion for SQL: `kll_quantile(sketch_bytes, rank)` → quantile
  * estimate. Interpreted eval (CodegenFallback) — estimate rows are
  * one-per-group, never the hot path. */
case class KllQuantile(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sketch: Any, rank: Any): Any =
    KllSketch.quantile(sketch.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_quantile"
}

object KllSketch {

  /** Column form: `kll_sketch_agg($"v")` → binary sketch. */
  def kll_sketch_agg(value: Column, k: Int = 200): Column =
    SqlBridge.column(KllSketchAggregate(
      SqlBridge.expression(value.cast("double")), k).toAggregateExpression())

  private def wrap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Quantile estimate at `rank` in [0, 1] (inclusive criteria, matching
    * SQL `percentile_disc`-style semantics on the retained sample). */
  def quantile(bytes: Array[Byte], rank: Double): Double =
    wrap(bytes).getQuantile(rank)

  def quantiles(bytes: Array[Byte], ranks: Array[Double]): Array[Double] = {
    val sk = wrap(bytes)
    ranks.map(sk.getQuantile)
  }

  /** Quantiles with an exact-regime GUARD: while the sketch has never
    * compacted (all n values retained, n ≤ k) its quantiles are exact order
    * statistics, `percentile_disc` semantics — hash-oracle-able. Past that
    * regime this THROWS instead of silently returning approximations that
    * would fail a value-hash oracle non-obviously (e.g. after a scale-factor
    * bump). Use [[quantiles]] for the approximate path. */
  def exactQuantiles(bytes: Array[Byte], ranks: Array[Double]): Array[Double] = {
    val sk = wrap(bytes)
    require(sk.getNumRetained == sk.getN,
      s"KLL sketch left the exact regime (n=${sk.getN}, retained=" +
      s"${sk.getNumRetained}); raise k above the group size or use the " +
      "approximate quantiles() path")
    ranks.map(sk.getQuantile)
  }

  /** The sketch's guaranteed normalized rank error (one-sided). */
  def rankError(bytes: Array[Byte]): Double =
    wrap(bytes).getNormalizedRankError(false)
}
