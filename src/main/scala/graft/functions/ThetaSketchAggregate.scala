package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregate — mergeable distinct-value sketches that, unlike
  * HLL, support set INTERSECTION and DIFFERENCE estimates after the fact.
  * That is the corpus-planning primitive at 100 TB: sketch each shard /
  * source / partition once (a few KB each, exact below 2^lgK distinct
  * values), then answer "how many documents do sources A and B share?" for
  * every pair from the sketches alone — no re-scan, no pairwise join of the
  * raw data.
  *
  * Same `TypedImperativeAggregate` tier as [[TopKAggregate]] (mutable
  * out-of-codegen buffer with partial/final merge): the buffer is a theta
  * `Union`; partials serialize as compact sketch bytes, so a shuffle carries
  * kilobytes per (partition, group) regardless of input size.
  *
  * Output: compact sketch bytes (`BinaryType`). Combine with
  * [[ThetaSketch.estimate]] / [[ThetaSketch.intersectionEstimate]] /
  * [[ThetaSketch.aNotBEstimate]] — tiny pure functions usable driver-side
  * or in a UDF over the (small) sketch rows.
  */
case class ThetaSketchAggregate(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  // Hashing contract (cross-type intersections depend on it): all integral
  // types — and decimals that are exact whole numbers within long range —
  // hash via update(Long), so an Int column and a Decimal(10,2) column
  // holding the same ids intersect correctly; Float widens to Double.
  // Double/Float are a SEPARATE key space from the integral one (update(5.0)
  // and update(5L) hash differently in the sketch library) — a double column
  // never intersects a long/decimal column even on equal whole values.
  // Unknown types THROW instead of falling back to toString, which would
  // silently hash to a disjoint key space and make every cross-type
  // intersection estimate ~0.
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.toString)
      case l: java.lang.Long => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case sh: java.lang.Short => buf.update(sh.longValue())
      case by: java.lang.Byte => buf.update(by.longValue())
      case d: java.lang.Double => buf.update(d.doubleValue())
      case f: java.lang.Float => buf.update(f.doubleValue())
      case dec: Decimal =>
        // whole numbers (scale <= 0 after strip) try longValueExact, which
        // covers EVERY long-range value — a digit-count pre-check undercounts
        // (5e18 has 19 integer digits yet fits a long, and must land in the
        // integral key space to intersect a Long column); the catch fires
        // only for whole values beyond Long range, never per ordinary row.
        // Fractional values take the double path with zero exceptions.
        val bd = dec.toJavaBigDecimal.stripTrailingZeros()
        if (bd.scale <= 0)
          try buf.update(bd.longValueExact())
          catch { case _: ArithmeticException => buf.update(bd.doubleValue()) }
        else buf.update(bd.doubleValue())
      case b: Array[Byte] => buf.update(b)
      case other => throw new UnsupportedOperationException(
        s"theta_sketch: unhashable input type ${other.getClass.getName}; " +
        "supported: string, integral, float/double, decimal, binary")
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArrayCompressed

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArrayCompressed

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAggregate =
    copy(child = newChildren(0))
  override def prettyName: String = "theta_sketch"
}

/** Scalar companion for SQL: `theta_estimate(sketch_bytes)` → distinct-count
  * estimate. Interpreted eval (CodegenFallback) is fine here — estimate rows
  * are one-per-group, never the hot path. */
case class ThetaEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    ThetaSketch.estimate(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}

object ThetaSketch {

  /** Column form: `theta_sketch_agg($"v")` → binary compact sketch. */
  def theta_sketch_agg(value: Column, lgK: Int = 14): Column =
    SqlBridge.column(ThetaSketchAggregate(
      SqlBridge.expression(value), lgK).toAggregateExpression())

  private def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  /** Distinct-count estimate of one sketch (exact while the sketch has seen
    * fewer than 2^lgK distinct values). */
  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  /** Estimated |A ∩ B|. */
  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(wrap(a))
    ix.intersect(wrap(b))
    ix.getResult.getEstimate
  }

  /** Estimated |A \ B|. */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).getEstimate

  /** GUARD for hash-oracled queries: theta sketches are exact (estimate ==
    * true distinct count) only while theta == 1, i.e. under 2^lgK distinct
    * values seen. Queries whose oracle compares exact values must call this
    * on every input sketch so a scale-factor bump fails LOUDLY here instead
    * of as a non-obvious hash mismatch downstream. */
  def requireExact(bytes: Array[Byte]): Array[Byte] = {
    val sk = wrap(bytes)
    require(!sk.isEstimationMode,
      s"theta sketch left the exact regime (theta=${sk.getTheta}, retained=" +
      s"${sk.getRetainedEntries}); raise lgK or use the estimate path")
    bytes
  }

  /** Exact-regime |A ∩ B| — [[requireExact]] on both inputs, then the
    * intersection (which is itself exact when both inputs are). */
  def exactIntersection(a: Array[Byte], b: Array[Byte]): Double =
    intersectionEstimate(requireExact(a), requireExact(b))

  /** Exact-regime |A \ B|. */
  def exactANotB(a: Array[Byte], b: Array[Byte]): Double =
    aNotBEstimate(requireExact(a), requireExact(b))

  /** Estimated |A ∪ B|. */
  def unionEstimate(a: Array[Byte], b: Array[Byte], lgK: Int = 14): Double = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.getEstimate
  }
}
