package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns —
  * the (b)-tier custom operator (custom Catalyst `Expression` with
  * `doGenCode`) for the similarity-search hot path.
  *
  * Why it exists when [[graft.ops.Similarity.cosine]] already works: the
  * higher-order-function form builds an intermediate product array per
  * row and walks the arrays three times (zip_with + two transforms);
  * this expression is one fused loop with three scalar accumulators and
  * no allocation, inlined into whole-stage codegen.
  *
  * Arithmetic is kept BIT-IDENTICAL to the HOF form (and the DuckDB
  * oracle): widen each float to double before multiplying, accumulate
  * left-to-right, `dot / (sqrt(na) * sqrt(nb))` — pinned by
  * CosineExpressionSpec's exact-equality test. Ragged (unequal-length)
  * inputs yield NULL, also matching the HOF form (zip_with null-pads).
  *
  * Registered as SQL function `graft_cosine` via
  * [[graft.expressions.GraftExtensions]] (SparkSessionExtensions).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // manual type check: ExpectsInputTypes.inputTypes names AbstractDataType,
  // which is private[sql] and unusable from an external package
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cosine requires (array<float>, array<float>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // ragged inputs yield NULL
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    // length mismatch → NULL, matching the zip_with HOF form (which
    // null-pads the shorter array and so aggregates to null)
    if (x.length != y.length) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    double $xi = (double) $x[$i]; double $yi = (double) $y[$i];
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
