package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-fold dot product of two Array[Float] columns in double precision —
  * the hot kernel of every similarity/ANN operator (ops/VectorOps).
  *
  * Why a custom expression: Spark's higher-order functions
  * (`aggregate(zip_with(...))`) are CodegenFallback and allocate a lambda
  * frame per element — ~50× slower on a 64-dim dot product evaluated
  * millions of times in a pair join. This expression compiles to a tight
  * primitive loop inside whole-stage codegen (`doGenCode`), keeping the
  * similarity join fully codegen'd at 100 TB scale.
  *
  * Semantics are IDENTICAL to the HOF form and to DuckDB's
  * `list_reduce(list_transform(...), +)`: per-index float→double widening,
  * strict left-to-right IEEE addition starting at 0.0 — bit-exact results
  * for the oracle compare. Null elements are treated as 0 contribution
  * (embeddings carry no null elements; documented engine contract).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // loud on length mismatch: a silent min() would hand corrupted or
    // mixed-model embeddings a plausible partial dot product — confident
    // wrong similarity scores are strictly worse than a failed job
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"float_vec_dot: length mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "float_vec_dot: length mismatch " + $x.numElements() + " vs " + $y.numElements());
         |}
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
