package graft

import org.apache.spark.sql.functions._

import graft.index.{IVFFlat, IVFPQ, PQ}
import graft.operators.Exhaustive

class IVFPQSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  /** Pinned parts, mirroring the pq_ivf_fixed oracle config. */
  private lazy val cents = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
    .select(col("embedding").cast("array<float>")).collect()
    .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
  private lazy val cbs = {
    val base = emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<float>")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    val dsub = base(0).length / 4
    Array.tabulate(4)(s => base.map(_.slice(s * dsub, (s + 1) * dsub)))
  }

  private def tuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("probe-ALL non-residual IVFPQ equals flat PQ ADC exactly") {
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    val composed = IVFPQ.build(emb, "vec_id", "embedding",
      cents, sizes, cbs, PQ.Params(m = 4, k = 16))
    val flat = PQ.withCodebooks(emb, "vec_id", "embedding",
      cbs, PQ.Params(m = 4, k = 16))
    val q = emb.filter(col("vec_id") < 10)
    val got = tuples(composed.searchMany(q, "vec_id", "embedding",
      k = 10, nprobe = cents.length))
    val want = tuples(flat.searchMany(q, "vec_id", "embedding", 10))
    assert(got == want)
  }

  test("fused build is deterministic and assigns the IVFFlat clusters") {
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    val m1 = IVFPQ.build(emb, "vec_id", "embedding",
      cents, sizes, cbs, PQ.Params(m = 4, k = 16))
    val m2 = IVFPQ.build(emb, "vec_id", "embedding",
      cents, sizes, cbs, PQ.Params(m = 4, k = 16))
    val c1 = m1.codes.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    val c2 = m2.codes.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(c1 == c2)
    // the fused coarse argmin agrees with IVFFlat.assign row for row
    val viaIvf = IVFFlat.assign(emb, "vec_id", "embedding", cents)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(2 - 1)).toMap
    assert(c1.view.mapValues(_._1).toMap == viaIvf)
  }

  test("residual training: probed search reaches useful recall, beats non-residual ADC") {
    val q = emb.filter(col("vec_id") < 20)
    val truth = Exhaustive.knnJoin(q, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.keys.toSeq
        .map(k => got.getOrElse(k, Set.empty).intersect(truth(k)).size / 10.0)
        .sum / truth.size
    }
    val resModel = IVFPQ.train(emb, "vec_id", "embedding",
      IVFFlat.Params(k = 8, numAttempts = 1, maxIterations = 10),
      PQ.Params(m = 16, k = 128, iterations = 10), residual = true)
    val rawModel = IVFPQ.train(emb, "vec_id", "embedding",
      IVFFlat.Params(k = 8, numAttempts = 1, maxIterations = 10),
      PQ.Params(m = 16, k = 128, iterations = 10), residual = false)
    val rRes = recallOf(resModel.searchMany(q, "vec_id", "embedding", 10, nprobe = 4))
    val rRaw = recallOf(rawModel.searchMany(q, "vec_id", "embedding", 10, nprobe = 4))
    assert(rRes >= 0.55, s"residual IVFPQ recall@10 = $rRes")
    // residual codes quantize intra-cell offsets — at identical storage
    // they must not lose to raw encoding under the same routing
    assert(rRes >= rRaw - 0.05, s"residual $rRes vs raw $rRaw")
    // exact re-rank on the probed shortlist recovers near-exact results
    val rRef = recallOf(resModel.searchManyRefined(q, "vec_id", "embedding",
      k = 10, factor = 4, nprobe = 4, emb, "vec_id", "embedding"))
    assert(rRef >= rRes - 1e-9, s"refined $rRef vs adc $rRes")
  }

  test("incremental add encodes identically to a full build (Index::add)") {
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    val p = PQ.Params(m = 4, k = 16)
    val incr = IVFPQ.build(emb.filter(col("vec_id") =!= 42), "vec_id", "embedding",
        cents, sizes, cbs, p)
      .add(emb.filter(col("vec_id") === 42), "vec_id", "embedding")
    val full = IVFPQ.build(emb, "vec_id", "embedding", cents, sizes, cbs, p)
    def codesOf(m: IVFPQ.Model) = m.codes.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(codesOf(incr) == codesOf(full))
  }

  test("batch composition does not change results (incl. residual)") {
    // the probe frame is per-(query, probed cell) and the top-k cut is
    // per-query, so a query's result must not depend on which other
    // queries share its batch — a 100-query batch equals the union of
    // two half batches, residual or not
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    val q = emb.filter(col("vec_id") < 100)
    def run(model: IVFPQ.Model, qs: org.apache.spark.sql.DataFrame) =
      tuples(model.searchMany(qs, "vec_id", "embedding", 10, nprobe = 3))
    for (resd <- Seq(false, true)) {
      val model = IVFPQ.build(emb, "vec_id", "embedding",
        cents, sizes, cbs, PQ.Params(m = 4, k = 16), residual = resd)
      val whole = run(model, q)
      val halves = run(model, q.filter(col("vec_id") < 50)) ++
        run(model, q.filter(col("vec_id") >= 50))
      assert(whole == halves, s"residual=$resd")
    }
  }

  test("rangeSearchRefined: probe-all + slack-inf == exhaustive radius; pruning only shrinks") {
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    val q = emb.filter(col("vec_id") < 10)
    val radius = 1.8
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs(Exhaustive.rangeSearch(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", radius))
    for (residual <- Seq(false, true)) {
      val model = IVFPQ.build(emb, "vec_id", "embedding",
        cents, sizes, cbs, PQ.Params(m = 4, k = 16), residual = residual)
      // probe-all, slack ∞: every code reaches the exact pass — the
      // exhaustive radius sweep, exact distances included
      val all = model.rangeSearchRefined(q, "vec_id", "embedding", radius,
        emb, "vec_id", "embedding", nprobe = cents.length)
      assert(pairs(all) == want, s"residual=$residual")
      all.collect().foreach(r => assert(r.getDouble(2) <= radius + 1e-12))
      // both pruning levers are subset-monotone: fewer probes and a
      // tighter slack can only DROP results, never invent them
      val probed = pairs(model.rangeSearchRefined(q, "vec_id", "embedding",
        radius, emb, "vec_id", "embedding", nprobe = 2))
      assert(probed.subsetOf(want), s"residual=$residual probed ⊄ exhaustive")
      val slacked = pairs(model.rangeSearchRefined(q, "vec_id", "embedding",
        radius, emb, "vec_id", "embedding", slack = radius * 4,
        nprobe = cents.length))
      assert(slacked.subsetOf(want), s"residual=$residual slacked ⊄ exhaustive")
      // ADC at 4× slack keeps the bulk of the true in-radius set
      if (want.nonEmpty)
        assert(slacked.size.toDouble / want.size >= 0.5,
          s"residual=$residual slack recall ${slacked.size}/${want.size}")
    }
  }

  test("save/load round-trip: layout partitioned by cluster, search preserved") {
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    val model = IVFPQ.build(emb, "vec_id", "embedding",
      cents, sizes, cbs, PQ.Params(m = 4, k = 16))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    model.save(dir)
    val dirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("cluster=")), dirs.toString)
    val re = IVFPQ.load(spark, dir)
    assert(re.pqParams == model.pqParams && re.dim == model.dim
      && re.residual == model.residual)
    val q = emb.filter(col("vec_id") < 5)
    val before = tuples(model.searchMany(q, "vec_id", "embedding", 10, nprobe = 2))
    val after = tuples(re.searchMany(q, "vec_id", "embedding", 10, nprobe = 2))
    assert(before == after)
  }
}
