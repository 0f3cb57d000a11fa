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

  test("rotation lifts sign-quantizer recall on anisotropic data") {
    // the benefit claim, measured: on data whose energy concentrates in
    // a few leading dims, plain sign bits spend most bits on noise
    // axes; the rotation spreads every direction's energy across all
    // bits. Corpus: x_j ~ scale_j * N(0,1), scale_j = 1/(1+j/2), d=64.
    val dim = 64; val n = 2000
    val rng = new scala.util.Random(13)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (rng.nextGaussian() / (1.0 + j / 2.0)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").cache()
    val queries = df.filter($"vec_id" < 20)
    val exact = graft.operators.Exhaustive.knnJoin(
        queries, "vec_id", "embedding", df, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // single-cell IVF (centroid 0) => BQ is raw sign coding
    def recallOf(frame: org.apache.spark.sql.DataFrame): Double = {
      val cents = Array(Array.fill(dim)(0f))
      val ivf = graft.index.IVFFlat.Model(
        graft.index.IVFFlat.Params(1), cents, Array(Long.MaxValue),
        graft.index.IVFFlat.assign(frame, "vec_id", "embedding", cents))
      val approx = graft.index.BQ.compress(ivf)
        .searchManyAsym(frame.filter(col("vec_id") < 20), "vec_id",
          "embedding", k = 10, nprobe = 1)
        .select("qid", "id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.keys.toSeq
        .map(q => approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 10.0)
        .sum / exact.size
    }
    val plain = recallOf(df)
    val rotated = recallOf(df.select(col("vec_id"),
      Rotate.rotate(col("embedding")).cast("array<float>").as("embedding")))
    assert(rotated > plain + 0.05, s"rotated $rotated vs plain $plain")
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
