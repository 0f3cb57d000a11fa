package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen kernel for product-quantization ADC distance —
  * the serving half of [[graft.index.PQ]]'s storage path, the same
  * fused-in-register discipline as [[Sq8Math]].
  *
  * The asymmetric distance of an m-byte code against a query is
  * Σ over subspaces s of Σ over dims i of (cb[s][code[s]][i] − q[off+i])²
  * — exactly the value the retired per-partition-LUT scan computed
  * (lut[s][c] held the identical 0.0-seeded, i-ordered double fold
  * and the scan added lut[s][code[s]] in s order), so the swap from
  * LUT lookups to this kernel was bit-identical by construction:
  * same IEEE adds, same order, only the table indirection removed.
  * Both the coarse-gridded (IVFPQ, r13) and flat (PQ.searchMany, r14)
  * serving scans now run on it.
  *
  * Why the kernel wins at scale: the LUT path runs in `mapPartitions`
  * — every probed (query, code) row pays Dataset deserialization (a
  * tuple + byte-array allocation) plus hash/array bookkeeping, outside
  * whole-stage codegen. At token-tier batch sizes (500 query tokens ×
  * 32 probed cells × 39k codes/cell ≈ 6×10⁸ rows at the 10M-token
  * head-to-head) that overhead IS the serve wall. This expression
  * keeps the whole probe join → distance → TopKAggExpr pipeline inside
  * one codegen stage: zero per-row allocation, codes stay packed
  * BINARY, the query travels once per (query, cell) probe pair in the
  * broadcast probe frame (residual-shifted there, so the kernel needs
  * no centroid access).
  *
  * The codebooks ride along as a reference object in the generated
  * class (m × k × dsub floats — tens of KB for token tiers, ~128 KB at
  * image-scale m=32/k=256/dim=128), not as a per-row column.
  */
object PqMath {

  /** ADC distance of a packed PQ `code` (BINARY, one byte per
    * subspace) against `q` (ARRAY<FLOAT|DOUBLE>, residual-shifted by
    * the caller when the codes are residual-encoded). */
  def adcDist(code: Column, q: Column,
              codebooks: Array[Array[Array[Float]]]): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(PqAdcExpr(GraftShims.expression(code),
      GraftShims.expression(q), codebooks))
  }
}

/** Σ_s Σ_i (cb[s][code[s]][i] − q[off_s+i])² in double — fused PQ ADC.
  * Arguments: (code BINARY(m), q ARRAY<FLOAT|DOUBLE> of the full
  * [padded] dim). A code shorter than the codebook count scores its
  * prefix (defensive; build always writes m bytes). */
case class PqAdcExpr(left: Expression, right: Expression,
                     codebooks: Array[Array[Array[Float]]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = right.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (left.dataType == BinaryType && qOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "pqAdcDist requires (BINARY, ARRAY<FLOAT|DOUBLE>), got " +
          children.map(_.dataType.simpleString).mkString(", "))
  }

  private def qElem(a: ArrayData, i: Int): Double =
    right.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def nullSafeEval(codeV: Any, qV: Any): Any = {
    val code = codeV.asInstanceOf[Array[Byte]]
    val q = qV.asInstanceOf[ArrayData]
    val m = math.min(code.length, codebooks.length)
    var tot = 0.0
    var off = 0
    var s = 0
    while (s < m) {
      val c = codebooks(s)(code(s) & 0xFF)
      var sub = 0.0
      var i = 0
      while (i < c.length) {
        val t = c(i).toDouble - qElem(q, off + i)
        sub += t * t
        i += 1
      }
      tot += sub
      off += c.length
      s += 1
    }
    tot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (code, q) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val tot = ctx.freshName("tot"); val sub = ctx.freshName("sub")
      val off = ctx.freshName("off"); val cb = ctx.freshName("cb")
      val m = ctx.freshName("m"); val t = ctx.freshName("t")
      val qAcc = right.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType  => s"(double) $q.getFloat($off + $i)"
        case DoubleType => s"$q.getDouble($off + $i)"
        case tp => throw new IllegalArgumentException(s"unsupported element type $tp")
      }
      s"""
         |int $m = java.lang.Math.min($code.length, $cbRef.length);
         |double $tot = 0.0;
         |int $off = 0;
         |for (int $s = 0; $s < $m; $s++) {
         |  float[] $cb = $cbRef[$s][$code[$s] & 0xFF];
         |  double $sub = 0.0;
         |  for (int $i = 0; $i < $cb.length; $i++) {
         |    double $t = (double) $cb[$i] - $qAcc;
         |    $sub += $t * $t;
         |  }
         |  $tot += $sub;
         |  $off += $cb.length;
         |}
         |${ev.value} = $tot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
