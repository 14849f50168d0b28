package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns, with whole-stage-codegen support.
  *
  * Compared to a Scala UDF this avoids the catalyst→Scala converter (no
  * per-call array boxing/copy into Seq) and stays inside the generated
  * code of the enclosing stage; compared to `zip_with`/`aggregate`
  * higher-order folds it avoids per-element interpreted lambda dispatch.
  *
  * Evaluation is a strict left-to-right double fold (dot, ‖a‖², ‖b‖² in
  * one pass, then dot / (√‖a‖²·√‖b‖²)) — the same association order as
  * the JVM kernel in `graft.ops.Similarity` and as a SQL engine's
  * list_cosine_similarity, so results are bit-identical across paths.
  *
  * Null/shape contract (identical in interpreted and codegen paths):
  * a NULL element in either array yields NULL (parquet-sourced arrays
  * are containsNull=true even when no null is ever present, so element
  * nulls must be handled, not rejected at type-check); mismatched
  * lengths fold over the common prefix (min length), matching the JVM
  * kernel's documented truncation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  /** Always nullable: even with non-null array columns, a null ELEMENT
    * nulls the result — and codegen needs a real isNull slot for that
    * (with the default input-driven nullability ev.isNull would fold to
    * the literal `false` and the element-null branch wouldn't compile).
    */
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // isNullAt on UnsafeArrayData is a bitset probe — cheaper than the
      // bulk toFloatArray copy it replaces, and null-consistent with the
      // interpreted path
      s"""
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xi = (double) $a.getFloat($i); double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "cosine_similarity")
}
