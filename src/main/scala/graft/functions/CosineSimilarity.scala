package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `array<double>`
  * columns in one fused pass (dot product + both norms in a single loop).
  *
  * This is the tier-(b) custom-operator path of the build plan: the
  * `functions._` composition (`aggregate(zip_with(...)) / (sqrt(aggregate...)
  * * sqrt(aggregate...))`) walks both arrays five times through interpreted
  * higher-order-function lambdas (HOFs sit outside whole-stage codegen); this
  * expression generates a tight scalar loop inside the enclosing codegen
  * stage — the shape that matters when brute-force ANN evaluates it
  * |queries|·|candidates| times.
  *
  * Null semantics: null if either input is null (BinaryExpression default)
  * or either vector has zero norm; array elements are assumed non-null
  * (embedding vectors), mismatched lengths compare the common prefix.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are guaranteed array<double> by the Column wrapper's cast, so no
  // ExpectsInputTypes (whose AbstractDataType is private[sql]) is needed.

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  /** Column form; casts both sides to array<double> so float embeddings work
    * directly: `cosine_similarity($"a", $"b")`. */
  def cosine_similarity(a: Column, b: Column): Column =
    SqlBridge.column(CosineSimilarity(
      SqlBridge.expression(a.cast("array<double>")),
      SqlBridge.expression(b.cast("array<double>"))))
}
