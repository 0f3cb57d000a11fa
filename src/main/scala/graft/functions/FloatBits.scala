package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** `ARRAY<FLOAT>` → `ARRAY<INT>` of raw IEEE-754 bit patterns — the
  * reference's `HashKey` reinterpretation (vers/src/indexes/base.rs:
  * 113-117: f32::to_bits per element) as a codegen expression. Raw bits
  * (not `floatToIntBits`) so distinct NaN payloads and ±0.0 stay
  * distinct, exactly the reference's bitwise-equality contract.
  * Null arrays propagate null; elements are non-null dense vectors. */
case class FloatBitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Float.floatToRawIntBits(a.getFloat(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $c.numElements();
         |int[] $arr = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = java.lang.Float.floatToRawIntBits($c.getFloat($i));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
