package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen kernels for SQ8 (per-vector affine int8)
  * compressed vectors — the serving half of [[Quant]]'s storage path.
  *
  * Codes are stored PACKED as `BINARY` (one byte per dimension,
  * unsigned 0..255): 4× fewer bytes than `ARRAY<FLOAT>` in the scan,
  * the shuffle, and the page cache — at 100 TB the embedding column IS
  * the table, so this is the difference between scanning 100 TB and
  * 25 TB per probe pass. Distance is computed directly over the packed
  * bytes (dequantize-in-register, no intermediate array), the Spark
  * analogue of FAISS's scalar-quantizer ADC loop.
  *
  * Precision contract (shared with [[Quant]] and the DuckDB oracle):
  * dequantized element = lo + code·scale in double; difference against
  * the double-widened query element; 0.0-seeded left-to-right
  * accumulation — bit-identical to dequantizing first and running
  * [[ArrayMath.sqDistFused]].
  */
object Sq8Math {
  import org.apache.spark.sql.GraftShims

  /** ARRAY<BIGINT|INT> of 0..255 → BINARY, one byte per element
    * (build-stage packing; values are masked to the low byte). */
  def packU8(codes: Column): Column =
    GraftShims.column(PackU8Expr(GraftShims.expression(codes)))

  /** Σ (qᵢ − (lo + byteᵢ·scale))² in double over packed codes. */
  def sq8Dist(codes: Column, lo: Column, scale: Column, q: Column): Column =
    GraftShims.column(Sq8DistExpr(
      GraftShims.expression(codes), GraftShims.expression(lo),
      GraftShims.expression(scale), GraftShims.expression(q)))
}

/** ARRAY<integral> (0..255 values) → BINARY, low byte of each element. */
case class PackU8Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType | IntegerType | ShortType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"packU8 requires ARRAY<integral>, got ${t.simpleString}")
    }

  private def elemLong(a: ArrayData, i: Int): Long =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case LongType    => a.getLong(i)
      case IntegerType => a.getInt(i).toLong
      case ShortType   => a.getShort(i).toLong
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (elemLong(a, i) & 0xffL).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val get = child.dataType.asInstanceOf[ArrayType].elementType match {
        case LongType    => s"$a.getLong($i)"
        case IntegerType => s"(long) $a.getInt($i)"
        case ShortType   => s"(long) $a.getShort($i)"
        case t => throw new IllegalArgumentException(s"unsupported element type $t")
      }
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) ($get & 0xffL);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Σ (qᵢ − (lo + (codesᵢ & 0xff)·scale))² — fused SQ8 ADC distance.
  * Arguments: (codes BINARY, lo DOUBLE, scale DOUBLE, q ARRAY<FLOAT|DOUBLE>).
  * Length mismatch iterates the shorter prefix (same rule as
  * [[FusedVecFold]]). */
case class Sq8DistExpr(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = fourth.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (first.dataType == BinaryType && second.dataType == DoubleType &&
        third.dataType == DoubleType && qOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sq8Dist requires (BINARY, DOUBLE, DOUBLE, ARRAY<FLOAT|DOUBLE>), got " +
          children.map(_.dataType.simpleString).mkString(", "))
  }

  private def qElem(a: ArrayData, i: Int): Double =
    fourth.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(c: Any, loV: Any, scV: Any, qV: Any): Any = {
    val codes = c.asInstanceOf[Array[Byte]]
    val lo = loV.asInstanceOf[Double]; val scale = scV.asInstanceOf[Double]
    val q = qV.asInstanceOf[ArrayData]
    val n = math.min(codes.length, q.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = qElem(q, i) - (lo + (codes(i) & 0xff).toDouble * scale)
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, lo, sc, q) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val qAcc = fourth.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType  => s"(double) $q.getFloat($i)"
        case DoubleType => s"$q.getDouble($i)"
        case t => throw new IllegalArgumentException(s"unsupported element type $t")
      }
      s"""
         |int $n = java.lang.Math.min($c.length, $q.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $qAcc - ($lo + (double) ($c[$i] & 0xff) * $sc);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression, d: Expression) =
    copy(first = a, second = b, third = c, fourth = d)
}
