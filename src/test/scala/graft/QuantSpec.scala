package graft

import org.apache.spark.sql.functions._

import graft.functions.Quant

class QuantSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("int8 codes are in 0..255 with the range endpoints pinned") {
    val rows = emb.select(
        Quant.int8Codes(col("embedding")).as("codes"))
      .collect().map(_.getAs[scala.collection.Seq[Long]](0))
    rows.foreach { codes =>
      assert(codes.forall(c => c >= 0L && c <= 255L))
      assert(codes.min == 0L, "the min element must code to 0")
      assert(codes.max == 255L, "the max element must code to 255")
    }
  }

  test("dequantization error is bounded by scale/2 (plus float ulps)") {
    val bad = emb.select(
        Quant.int8Scale(col("embedding")).as("scale"),
        Quant.int8MaxAbsErr(col("embedding")).as("err"))
      .filter(col("err") > col("scale") / lit(2.0d) * lit(1.0 + 1e-9) + lit(1e-12))
      .count()
    assert(bad == 0L)
  }

  test("constant vector quantizes to zero codes and zero error") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(0.25f))).toDF("id", "v")
    val r = df.select(
      Quant.int8Codes(col("v")).as("codes"),
      Quant.int8MaxAbsErr(col("v")).as("err"),
      Quant.int8Dequant(col("v")).as("deq")).head()
    assert(r.getAs[scala.collection.Seq[Long]](0).forall(_ == 0L))
    assert(r.getDouble(1) == 0.0)
    assert(r.getAs[scala.collection.Seq[Double]](2).forall(_ == 0.25f.toDouble))
  }

  test("hand-computed example: [0, 1] range splits into exact steps") {
    import spark.implicits._
    // v = [0, 1, 0.5]: lo=0, hi=1, scale=1/255; codes 0, 255, round(127.5)=128
    val df = Seq((1L, Array(0.0f, 1.0f, 0.5f))).toDF("id", "v")
    val codes = df.select(Quant.int8Codes(col("v"))).head()
      .getAs[scala.collection.Seq[Long]](0)
    assert(codes == Seq(0L, 255L, 128L))
  }
}
