package graft

import org.apache.spark.sql.functions._

import graft.index.{BQ, HNSW, HNSWGraph, IVFFlat, IVFPQ, PQ, SQ8}

/** Model.merge across the index family — the cross-job compaction path.
  * The big equalities (merge ≡ single build, hash-for-hash) live in the
  * driver oracle lanes (ivf_merge_fixed, sq8_merge_all, bq_merge_asym_all,
  * pq_merge_fixed, pq_ivf_merge_fixed, hnsw_merge_exact); this spec covers
  * what those can't: the incompatibility guards, the same-centroid fast
  * path's size bookkeeping, routed-HNSW merge, and size saturation. */
class MergeSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val cents = SparkEntry.fixedCentroids(emb)

  private def ivfHalf(cond: org.apache.spark.sql.Column): IVFFlat.Model = {
    val rows = IVFFlat.assign(emb.filter(cond), "vec_id", "embedding", cents)
    val sz = new Array[Long](cents.length)
    rows.groupBy("cluster").count().collect()
      .foreach(r => sz(r.getInt(0)) = r.getLong(1))
    IVFFlat.Model(IVFFlat.Params(cents.length), cents, sz, rows)
  }

  test("IVFFlat merge fast path: same centroids union without a job and sizes add") {
    val a = ivfHalf(col("vec_id") % 2 === 0)
    val b = ivfHalf(col("vec_id") % 2 === 1)
    val m = a.merge(b)
    assert(m.clusterSizes.toSeq ==
      a.clusterSizes.zip(b.clusterSizes).map { case (x, y) => x + y }.toSeq)
    assert(m.indexed.count() == emb.count())
    // merged search equals the single full assignment's search
    val full = IVFFlat.Model(IVFFlat.Params(cents.length), cents,
      m.clusterSizes, IVFFlat.assign(emb, "vec_id", "embedding", cents))
    val got = m.searchMany(emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nprobe = 2).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = full.searchMany(emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nprobe = 2).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("merge keeps the corpus narrow: no exchange in the merged frame") {
    // different grid forces the re-assign branch; assign is a narrow
    // broadcast-argmin map, so the merged frame is union(scan, map(scan))
    // — any ShuffleExchange means the corpus started moving at merge
    val otherCents = cents.map(_.map(v => v + 0.5f))
    val a = ivfHalf(col("vec_id") % 2 === 0)
    val b = IVFFlat.Model(IVFFlat.Params(otherCents.length), otherCents,
      new Array[Long](otherCents.length),
      IVFFlat.assign(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", otherCents))
    val m = a.merge(b)
    m.indexed.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(flatten)
    val shuffles = flatten(m.indexed.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"merged corpus frame shuffles:\n${m.indexed.queryExecution.executedPlan.toString.take(600)}")
  }

  test("grid-union merge keeps both grids and routes adds across them") {
    val a = ivfHalf(col("vec_id") % 2 === 0)
    val otherCents = cents.map(_.map(v => v * 0.9f))
    val bRows = IVFFlat.assign(emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", otherCents)
    val bSizes = new Array[Long](otherCents.length)
    bRows.groupBy("cluster").count().collect()
      .foreach(r => bSizes(r.getInt(0)) = r.getLong(1))
    val b = IVFFlat.Model(IVFFlat.Params(otherCents.length), otherCents,
      bSizes, bRows)
    val m = a.mergeGridUnion(b)
    assert(m.params.k == a.centroids.length + b.centroids.length)
    assert(m.centroids.length == m.params.k &&
      m.clusterSizes.toSeq == (a.clusterSizes ++ b.clusterSizes).toSeq)
    assert(m.indexed.count() == emb.count())
    // incoming rows keep their own grid's cells, renumbered past A's
    val bClusters = m.indexed.filter(col("id") % 2 === 1)
      .select(min(col("cluster"))).head().getInt(0)
    assert(bClusters >= a.centroids.length)
    // a query from the incoming half finds itself at distance 0 under
    // generous probing
    val qv = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val hit = m.search(qv, k = 1, minProbe = m.params.k).head()
    assert(hit.getLong(0) == 7L && hit.getDouble(1) == 0.0)
  }

  test("loaded models merge on the fast path: grids round-trip bitwise") {
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    def half(cond: org.apache.spark.sql.Column) = SQ8.compress(
      IVFFlat.Model(IVFFlat.Params(cents.length), cents, sizes,
        IVFFlat.assign(emb.filter(cond), "vec_id", "embedding", cents)))
    val dirA = java.nio.file.Files.createTempDirectory("sq8_mA").toString
    val dirB = java.nio.file.Files.createTempDirectory("sq8_mB").toString
    half(col("vec_id") % 2 === 0).save(dirA)
    half(col("vec_id") % 2 === 1).save(dirB)
    // parquet round-trips floats exactly, so the two loaded grids are
    // bitwise-identical and the union-only fast path must accept them
    val m = SQ8.load(spark, dirA).merge(SQ8.load(spark, dirB))
    assert(m.codes.count() == emb.count())
    // sizes now ride the sidecar: the SAVED forced-probe sentinels
    // round-trip verbatim (the old load recounted and silently
    // destroyed probe-all configs) and satAdd keeps them saturated
    assert(m.clusterSizes.forall(_ == Long.MaxValue))
    // a model saved with TRUE counts round-trips those counts
    val cSizes = new Array[Long](cents.length)
    val cRows = IVFFlat.assign(emb, "vec_id", "embedding", cents)
    cRows.groupBy("cluster").count().collect()
      .foreach(r => cSizes(r.getInt(0)) = r.getLong(1))
    val dirC = java.nio.file.Files.createTempDirectory("sq8_mC").toString
    SQ8.compress(IVFFlat.Model(IVFFlat.Params(cents.length), cents,
      cSizes, cRows)).save(dirC)
    assert(SQ8.load(spark, dirC).clusterSizes.toSeq == cSizes.toSeq)
    assert(SQ8.load(spark, dirC).clusterSizes.sum == emb.count())
  }

  test("merge size saturation keeps forced-probe configs intact") {
    assert(graft.index.MergeOps.satAdd(
      Array(Long.MaxValue, 3L), Array(Long.MaxValue, 4L)).toSeq ==
      Seq(Long.MaxValue, 7L))
  }

  test("SQ8/BQ/PQ/IVFPQ merge guards refuse incompatible coding frames") {
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    def ivf(cond: org.apache.spark.sql.Column) =
      IVFFlat.Model(IVFFlat.Params(cents.length), cents, sizes,
        IVFFlat.assign(emb.filter(cond), "vec_id", "embedding", cents))
    val ivfA = ivf(col("vec_id") % 2 === 0)
    val ivfB = ivf(col("vec_id") % 2 === 1)

    // SQ8: rotation-frame mismatch
    intercept[IllegalArgumentException] {
      SQ8.compress(ivfA).merge(SQ8.compress(ivfB, rotated = true))
    }
    // SQ8: different coarse centroids
    val otherCents = cents.map(_.map(v => v + 1.0f))
    intercept[IllegalArgumentException] {
      SQ8.compress(ivfA).merge(SQ8.compress(
        ivfB.copy(centroids = otherCents)))
    }
    // BQ: residual-frame mismatch
    intercept[IllegalArgumentException] {
      BQ.compress(ivfA).merge(BQ.compressResidual(ivfB))
    }
    // PQ: different codebooks
    val cbs = SparkEntry.fixedCodebooks(emb, 4)
    val p = PQ.Params(m = 4, k = 16)
    val otherCbs = cbs.map(_.map(_.map(v => v + 1.0f)))
    intercept[IllegalArgumentException] {
      PQ.withCodebooks(emb.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", cbs, p)
        .merge(PQ.withCodebooks(emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", otherCbs, p))
    }
    // IVFPQ: residual mismatch
    intercept[IllegalArgumentException] {
      IVFPQ.build(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          cents, sizes, cbs, p, residual = false)
        .merge(IVFPQ.build(emb.filter(col("vec_id") % 2 === 1), "vec_id",
          "embedding", cents, sizes, cbs, p, residual = true))
    }
  }

  test("LSHForest merge routes the incoming half through surviving planes") {
    import graft.index.LSHForest
    val p = LSHForest.Params(numTrees = 4, maxNodeSize = 64)
    val a = LSHForest.build(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", p)
    val b = LSHForest.build(emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", p)
    val m = a.merge(b)
    assert(m.indexed.count() == emb.count())
    // a query drawn from the INCOMING half finds itself at distance 0
    val qv = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val hit = m.search(qv, k = 1).head()
    assert(hit.getLong(0) == 7L && hit.getDouble(1) == 0.0)
  }

  test("HNSW merge guards refuse differing graph params") {
    val pa = HNSWGraph.Params(numLayers = 4, efConstruction = 32,
      efSearch = 32, m = 8)
    val pb = pa.copy(m = 16)
    val a = HNSW.build(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", pa, numShards = 1)
    val b = HNSW.build(emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", pb, numShards = 1)
    intercept[IllegalArgumentException] { a.merge(b) }
  }

  test("routed HNSW merge concatenates router cells and searches both halves") {
    val p = SparkEntry.hnswExactParams
    val a = HNSW.buildRouted(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", p, numShards = 2, routerIterations = 2)
    val b = HNSW.buildRouted(emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", p, numShards = 2, routerIterations = 2)
    val m = a.merge(b)
    assert(m.numShards == a.numShards + b.numShards)
    assert(m.routers.get.length == a.routers.get.length + b.routers.get.length)
    // full fan-out over the merged shards is exhaustive (ef >> n per
    // shard): equals the 1-shard exact build over the whole corpus
    val whole = HNSW.build(emb, "vec_id", "embedding", p, numShards = 1)
    def res(model: HNSW.Model) =
      model.searchMany(emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e12))).toSet
    assert(res(m) == res(whole))
    // probing every CELL routes to all physical shards too
    assert(res(m) == m.searchMany(emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, probeShards = m.routers.get.length)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e12))).toSet)
    // tombstones union across the halves
    val mr = a.remove(emb.filter(col("vec_id") === 0), "vec_id")
      .merge(b.remove(emb.filter(col("vec_id") === 1), "vec_id"))
    assert(mr.removed == Set(0L, 1L))
  }
}
