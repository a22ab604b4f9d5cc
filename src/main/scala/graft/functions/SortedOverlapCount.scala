package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: |a ∩ b| of two SORTED, DEDUPLICATED
  * `array<string>` columns via a single merge pass — the verification
  * kernel of the exact set-similarity joins (SetSimJoin, the MinHash /
  * sketch-recall Jaccard verify).
  *
  * Why not `size(array_intersect(a, b))` (optimization guide §1.2 "per-task
  * work", measured in round 20): the built-in materializes the intersection
  * array through a per-row hash set (~6 µs/pair on 25-token sets), and —
  * decisive in the join shapes that use it — the Jaccard filter collapses
  * into the JOIN CONDITION, where Catalyst re-evaluates the whole
  * `array_intersect` up to three times per candidate row (once per
  * reference; no subexpression elimination inside join conditions). A merge
  * over pre-sorted arrays is ~50 ns/pair and cheap enough that repeated
  * evaluation stops mattering.
  *
  * CONTRACT: both inputs must be sorted ascending in UTF8 binary order
  * (`sort_array`'s order for `array<string>`) and element-deduplicated,
  * with no null elements — exactly what `sort_array(array_distinct(...))`
  * produces. On such inputs the result equals
  * `size(array_intersect(a, b))` (spec-pinned); on unsorted inputs the
  * count is undefined. Null semantics: null if either input is null
  * (BinaryExpression default).
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_overlap_count"
}

object SortedOverlapCount {
  /** Column form: `sorted_overlap_count($"a", $"b")` — |a ∩ b| of two
    * sorted, deduplicated `array<string>` columns. */
  def sorted_overlap_count(a: Column, b: Column): Column =
    SqlBridge.column(SortedOverlapCount(
      SqlBridge.expression(a), SqlBridge.expression(b)))
}
