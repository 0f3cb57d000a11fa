package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen kernels for 1-bit (sign) binary quantization —
  * the extreme end of the compression curve that [[Quant]]/[[Sq8Math]]
  * start: 1 BIT per dimension instead of 8 (SQ8) or 32 (float32).
  * A 128-dim float vector is 512 bytes; its sign code is 16 bytes —
  * 32× fewer bytes in the parquet scan, the probe join, and the page
  * cache. At 100 TB of embeddings the sign-code table is ~3 TB, small
  * enough to pin in cluster memory, which is why production vector
  * stores (FAISS binary indexes, the BQ tiers in hosted vector DBs)
  * serve the first-pass shortlist from exactly this representation and
  * re-rank the survivors against full-precision vectors.
  *
  * Bit layout (shared contract with the DuckDB oracle via the
  * sign-rule: bit i is 1 iff element i > 0): element i lives at byte
  * i>>3, bit i&7 (LSB-first). Trailing pad bits of the last byte are
  * zero on BOTH sides of any symmetric op, so Hamming over the packed
  * bytes equals Hamming over the element-wise sign disagreements.
  *
  * Two distances, two serving shapes:
  *  - symmetric Hamming (code vs code): XOR + popcount, the cheapest
  *    possible scan — used when queries are also quantized;
  *  - asymmetric signed dot (float query vs code): Σ qᵢ·(bitᵢ?+1:−1),
  *    strictly more informative than Hamming for a float query and
  *    free of the query's own quantization error.
  */
object BqMath {

  /** ARRAY<FLOAT|DOUBLE> → BINARY sign bitmap (bit set iff element > 0),
    * ceil(n/8) bytes, LSB-first. Build-stage narrow map. */
  def packSignBits(vec: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(PackSignBitsExpr(GraftShims.expression(vec)))
  }

  /** Popcount(xor) over two packed sign bitmaps (INT). STRICT on
    * length: a byte-length mismatch throws instead of scoring a
    * prefix — a dimension-mismatch bug (e.g. a rotated 128-pad query
    * against 64-dim codes) must fail loudly, not return a plausible
    * partial score (the rotated tiers make that mismatch reachable;
    * VERDICT r8 §wrong #1). */
  def hammingDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(HammingDistExpr(
      GraftShims.expression(a), GraftShims.expression(b)))
  }

  /** Σ qᵢ · (bitᵢ ? +1 : −1) in double, 0.0-seeded left-to-right —
    * the asymmetric BQ score (bigger = more aligned). STRICT on
    * dimension: the code must be exactly the packed width of the
    * query, |codes| == ceil(|q|/8), else the kernel throws (same
    * loud-failure contract as [[hammingDist]]). */
  def asymDot(codes: Column, q: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(BqAsymDotExpr(
      GraftShims.expression(codes), GraftShims.expression(q)))
  }

  /** Driver-side twin of [[packSignBits]] for single-query literals. */
  def packBits(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte]((v.length + 7) >> 3)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Double variant (residual coding packs double differences). */
  def packBitsD(v: Array[Double]): Array[Byte] = {
    val out = new Array[Byte]((v.length + 7) >> 3)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0d) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }
}

/** ARRAY<FLOAT|DOUBLE> → BINARY: bit i of byte i>>3 (LSB-first) set
  * iff element i > 0. Pad bits zero. */
case class PackSignBitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"packSignBits requires ARRAY<FLOAT|DOUBLE>, got ${t.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte]((n + 7) >> 3)
    var i = 0
    while (i < n) {
      val pos = if (isFloat) a.getFloat(i) > 0f else a.getDouble(i) > 0d
      if (pos) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val test =
        if (isFloat) s"$a.getFloat($i) > 0.0f" else s"$a.getDouble($i) > 0.0d"
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[($n + 7) >> 3];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($test) $out[$i >> 3] |= (byte) (1 << ($i & 7));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** popcount(a XOR b) over equal-length packed codes (INT); throws on a
  * byte-length mismatch — partial Hamming over a prefix is always a
  * caller bug, never a meaningful score. */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hammingDist requires (BINARY, BINARY), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]; val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length) throw new IllegalArgumentException(
      s"hammingDist: code length mismatch (${a.length} vs ${b.length} " +
        "bytes) — operands must be packed from equal-dimension vectors")
    var s = 0; var i = 0
    while (i < a.length) { s += Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException(
         |    "hammingDist: code length mismatch (" + $a.length + " vs " +
         |    $b.length + " bytes) — operands must be packed from " +
         |    "equal-dimension vectors");
         |}
         |int $s = 0;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ qᵢ · (codes bit i ? +1.0 : −1.0) in double, 0.0-seeded
  * left-to-right; requires |codes| == ceil(|q|/8) (throws otherwise). */
case class BqAsymDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = right.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (left.dataType == BinaryType && qOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bqAsymDot requires (BINARY, ARRAY<FLOAT|DOUBLE>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def qIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    val q = r.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (codes.length != (n + 7) >> 3) throw new IllegalArgumentException(
      s"bqAsymDot: code/query dimension mismatch (${codes.length} code " +
        s"bytes vs $n query dims, expected ${(n + 7) >> 3} bytes)")
    var s = 0.0; var i = 0
    while (i < n) {
      val qi = if (qIsFloat) q.getFloat(i).toDouble else q.getDouble(i)
      val bit = (codes(i >> 3) >> (i & 7)) & 1
      s += (if (bit == 1) qi else -qi)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val qi = ctx.freshName("qi")
      val qAcc = if (qIsFloat) s"(double) $q.getFloat($i)" else s"$q.getDouble($i)"
      s"""
         |int $n = $q.numElements();
         |if ($c.length != (($n + 7) >> 3)) {
         |  throw new IllegalArgumentException(
         |    "bqAsymDot: code/query dimension mismatch (" + $c.length +
         |    " code bytes vs " + $n + " query dims, expected " +
         |    (($n + 7) >> 3) + " bytes)");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $qi = $qAcc;
         |  $s += ((($c[$i >> 3] >> ($i & 7)) & 1) == 1) ? $qi : -$qi;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
