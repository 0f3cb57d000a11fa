package graft

import org.apache.spark.sql.functions._

import graft.functions.Rotate
import graft.index.{BQ, IVFFlat, PQ, SQ8}

/** Rotation COMPOSED into the quantized tiers (VERDICT r7 item 1):
  * `rotated = true` on BQ/SQ8.compress and PQ.train/withCodebooks must
  * (a) round-trip through save/load, (b) rotate queries internally so
  * callers never pre-rotate, and (c) deliver the anisotropic-recall
  * lift RotateSpec proves for the raw sign quantizer. */
class RotatedTiersSpec extends SparkSpec {
  import spark.implicits._

  // anisotropic corpus: x_j ~ N(0,1)/(1+j/2) — energy concentrated in
  // the leading dims, the regime of real LLM embeddings (RotateSpec's
  // generator, shared shape)
  private val dim = 64
  private lazy val aniso = {
    val rng = new scala.util.Random(13)
    (0 until 2000).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (rng.nextGaussian() / (1.0 + j / 2.0)).toFloat))
    }.toDF("vec_id", "embedding").cache()
  }
  private lazy val exact10 = graft.operators.Exhaustive.knnJoin(
      aniso.filter($"vec_id" < 20), "vec_id", "embedding",
      aniso, "vec_id", "embedding", 10)
    .select("qid", "id").as[(Long, Long)].collect()
    .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
    val approx = res.select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    exact10.keys.toSeq
      .map(q => approx.getOrElse(q, Set.empty).intersect(exact10(q)).size / 10.0)
      .sum / exact10.size
  }

  private lazy val ivfAniso = IVFFlat.build(aniso, "vec_id", "embedding",
    IVFFlat.Params(k = 4, numAttempts = 1, maxIterations = 5))

  test("BQ.compress(rotated) lifts recall on anisotropic data, queries unrotated") {
    val queries = aniso.filter($"vec_id" < 20)
    val plain = recallOf(BQ.compress(ivfAniso)
      .searchManyAsym(queries, "vec_id", "embedding", k = 10, nprobe = 4))
    val rot = recallOf(BQ.compress(ivfAniso, rotated = true)
      .searchManyAsym(queries, "vec_id", "embedding", k = 10, nprobe = 4))
    assert(rot > plain + 0.05, s"rotated $rot vs plain $plain")
  }

  test("PQ.train(rotated) lifts ADC recall on anisotropic data") {
    val queries = aniso.filter($"vec_id" < 20)
    val params = PQ.Params(m = 8, k = 32, iterations = 5, seed = 7L)
    val plain = recallOf(
      PQ.train(aniso, "vec_id", "embedding", params)
        .searchMany(queries, "vec_id", "embedding", 10))
    val rot = recallOf(
      PQ.train(aniso, "vec_id", "embedding", params, rotated = true)
        .searchMany(queries, "vec_id", "embedding", 10))
    assert(rot > plain + 0.02, s"rotated $rot vs plain $plain")
    assert(rot > 0.3, s"rotated PQ recall too low: $rot")
  }

  test("rotated BQ (plain + residual) round-trips through save/load") {
    val queries = aniso.filter($"vec_id" < 5)
    for (residual <- Seq(false, true)) {
      val model =
        if (residual) BQ.compressResidual(ivfAniso, rotated = true)
        else BQ.compress(ivfAniso, rotated = true)
      val before = model
        .searchManyAsym(queries, "vec_id", "embedding", k = 10, nprobe = 4)
        .orderBy("qid", "distance", "id").collect()
      val dir = java.nio.file.Files.createTempDirectory("bq_rot_rt").toString
      model.save(dir)
      val re = BQ.load(spark, dir)
      assert(re.rotated && re.residual == residual)
      val after = re.copy(clusterSizes = re.clusterSizes.map(_ => Long.MaxValue))
        .searchManyAsym(queries, "vec_id", "embedding", k = 10,
          nprobe = re.params.k)
        .orderBy("qid", "distance", "id").collect()
      assert(before.toSeq == after.toSeq, s"residual=$residual round-trip drift")
    }
  }

  test("rotated PQ round-trips through save/load") {
    val queries = aniso.filter($"vec_id" < 5)
    val model = PQ.train(aniso, "vec_id", "embedding",
      PQ.Params(m = 8, k = 16, iterations = 3, seed = 7L), rotated = true)
    val before = model.searchMany(queries, "vec_id", "embedding", 10)
      .orderBy("qid", "distance", "id").collect()
    val dir = java.nio.file.Files.createTempDirectory("pq_rot_rt").toString
    model.save(dir)
    val re = PQ.load(spark, dir)
    assert(re.rotated)
    assert(re.dim == Rotate.padLenOf(dim))
    val after = re.searchMany(queries, "vec_id", "embedding", 10)
      .orderBy("qid", "distance", "id").collect()
    assert(before.toSeq == after.toSeq)
  }

  test("rotated SQ8 search equals search over the explicitly-rotated corpus") {
    // composition contract: compress(ivf, rotated=true) ≡ rotating the
    // corpus by hand, compressing plain, and rotating queries by hand
    val queries = aniso.filter($"vec_id" < 5)
    val composed = SQ8.compress(ivfAniso, rotated = true)
      .searchMany(queries, "vec_id", "embedding", k = 10, nprobe = 4)
      .orderBy("qid", "distance", "id").collect()
    val handRotated = aniso.select(col("vec_id"),
      Rotate.rotate(col("embedding")).as("embedding"))
    // same cells (fixed from the unrotated build), hand-rotated payload
    val ivfHand = ivfAniso.copy(indexed =
      IVFFlat.assign(aniso, "vec_id", "embedding", ivfAniso.centroids)
        .select(col("id"), col("cluster"))
        .join(handRotated.withColumnRenamed("vec_id", "id"), "id")
        .withColumnRenamed("embedding", "vector"))
    val byHand = SQ8.compress(ivfHand)
      .searchMany(queries.select(col("vec_id"),
          Rotate.rotate(col("embedding")).as("embedding")),
        "vec_id", "embedding", k = 10, nprobe = 4)
      .orderBy("qid", "distance", "id").collect()
    // same neighbors in the same order; distances agree only to float
    // precision — the public searchMany casts the hand-rotated DOUBLE
    // query to float on entry, while the composed path keeps the
    // internally-rotated query in double end to end
    assert(composed.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      byHand.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    composed.zip(byHand).foreach { case (a, b) =>
      val da = a.getDouble(2); val db = b.getDouble(2)
      assert(math.abs(da - db) <= 1e-6 * math.max(1.0, math.abs(da)),
        s"distance drift $da vs $db")
    }
  }
}
