package graft

import org.apache.spark.sql.functions._

import graft.functions.Rotate

class RotateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("rotation preserves norms (orthogonality witness)") {
    val rows = emb.select(
        aggregate(col("embedding").cast("array<double>"), lit(0.0d),
          (a, x) => a + x * x).as("n_in"),
        aggregate(Rotate.rotate(col("embedding")), lit(0.0d),
          (a, x) => a + x * x).as("n_rot"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val in = r.getDouble(0); val rot = r.getDouble(1)
      assert(math.abs(in - rot) <= 1e-9 * math.max(1.0, in),
        s"norm drift $in vs $rot")
    }
  }

  test("rotation preserves pairwise squared distances") {
    val a = emb.filter($"vec_id" < 30)
      .select(col("vec_id").as("ida"),
        col("embedding").cast("array<double>").as("va"),
        Rotate.rotate(col("embedding")).as("ra"))
    val b = emb.filter($"vec_id" >= 30 && $"vec_id" < 60)
      .select(col("vec_id").as("idb"),
        col("embedding").cast("array<double>").as("vb"),
        Rotate.rotate(col("embedding")).as("rb"))
    val rows = a.crossJoin(b).select(
        graft.functions.VectorOps.sqDist(col("va"), col("vb")).as("d_in"),
        graft.functions.VectorOps.sqDist(col("ra"), col("rb")).as("d_rot"))
      .collect()
    assert(rows.length == 900)
    rows.foreach { r =>
      val din = r.getDouble(0); val drot = r.getDouble(1)
      assert(math.abs(din - drot) <= 1e-9 * math.max(1.0, din),
        s"distance drift $din vs $drot")
    }
  }

  test("non-power-of-two input zero-pads and keeps norm") {
    val df = Seq((1L, Array(1.0f, -2.0f, 3.0f, 0.5f, -0.25f)))
      .toDF("id", "v")
    val r = df.select(Rotate.rotate(col("v")).as("r"),
        aggregate(Rotate.rotate(col("v")), lit(0.0d),
          (a, x) => a + x * x).as("n"))
      .head()
    assert(r.getAs[scala.collection.Seq[Double]]("r").length == 8)
    val nIn = 1.0 + 4.0 + 9.0 + 0.25 + 0.0625
    assert(math.abs(r.getDouble(1) - nIn) <= 1e-12 * nIn)
  }

  test("rotation is deterministic and the kernel matches a driver FWHT") {
    val v = emb.filter($"vec_id" === 11)
      .select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val got = emb.filter($"vec_id" === 11)
      .select(Rotate.rotate(col("embedding"))).head()
      .getAs[scala.collection.Seq[Double]](0).toArray
    val buf = new Array[Double](Rotate.padLenOf(v.length))
    v.indices.foreach { i =>
      val x = v(i).toDouble
      buf(i) = if (Rotate.signPositive(i)) x else -x
    }
    Rotate.fwhtInPlace(buf)
    assert(got.toSeq == buf.toSeq)
  }
}
