package graft

import org.apache.spark.sql.functions._

/** Takedown coverage: every index type must stop RETURNING a removed id
  * while leaving every other result untouched — the
  * right-to-be-forgotten contract. The four row-state indexes
  * hard-remove (anti-join); HNSW soft-deletes (tombstones + over-fetch,
  * purged on rebuild). */
class RemoveSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  // vec 42's own vector: the query whose nearest neighbour IS 42
  private lazy val q42: Array[Float] = emb.filter($"vec_id" === 42)
    .select($"embedding".cast("array<float>")).head()
    .getAs[scala.collection.Seq[Float]](0).toArray

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("id")).collect().map(_.getLong(0)).toSeq

  test("IVFFlat.remove: removed id gone, survivors' results unchanged") {
    val model = graft.index.IVFFlat.build(emb, "vec_id", "embedding",
      graft.index.IVFFlat.Params(k = 8, numAttempts = 1, maxIterations = 5))
    val before = ids(model.search(q42, 5))
    assert(before.head == 42L)
    val after = model.remove(Seq(42L).toDF("vec_id"), "vec_id")
    val got = ids(after.search(q42, 5))
    assert(!got.contains(42L))
    // survivors keep their relative order: before minus 42, plus one
    assert(got.take(4) == before.filterNot(_ == 42L))
    assert(after.indexed.count() == emb.count() - 1)
  }

  test("LSHForest.remove: removed id gone from the forest search") {
    val model = graft.index.LSHForest.build(emb, "vec_id", "embedding",
      graft.index.LSHForest.Params(numTrees = 1, maxNodeSize = Int.MaxValue))
    assert(ids(model.search(q42, 3)).head == 42L)
    val after = model.remove(Seq(42L).toDF("vec_id"), "vec_id")
    assert(!ids(after.search(q42, 3)).contains(42L))
    assert(after.indexed.count() == emb.count() - 1)
  }

  test("PQ and IVFPQ remove: removed code gone from ADC results") {
    val cbs = SparkEntry.fixedCodebooks(emb, 4)
    val params = graft.index.PQ.Params(m = 4, k = 16)
    val pq = graft.index.PQ.withCodebooks(emb, "vec_id", "embedding", cbs, params)
      .remove(Seq(42L).toDF("vec_id"), "vec_id")
    assert(pq.codes.count() == emb.count() - 1)
    assert(!pq.searchMany(emb.filter($"vec_id" === 42), "vec_id", "embedding", 10)
      .collect().map(_.getLong(1)).contains(42L))
    val cents = SparkEntry.fixedCentroids(emb)
    val ipq = graft.index.IVFPQ.build(emb, "vec_id", "embedding", cents,
        Array.fill(cents.length)(Long.MaxValue), cbs, params)
      .remove(Seq(42L).toDF("vec_id"), "vec_id")
    assert(ipq.codes.count() == emb.count() - 1)
    assert(!ipq.searchMany(emb.filter($"vec_id" === 42), "vec_id", "embedding",
        k = 10, nprobe = cents.length)
      .collect().map(_.getLong(1)).contains(42L))
  }

  test("remove edge cases: re-remove is idempotent; remove-all searches empty, not crashed") {
    val model = graft.index.IVFFlat.build(emb, "vec_id", "embedding",
      graft.index.IVFFlat.Params(k = 4, numAttempts = 1, maxIterations = 3))
    val once = model.remove(Seq(42L).toDF("vec_id"), "vec_id")
    val twice = once.remove(Seq(42L).toDF("vec_id"), "vec_id")
    assert(twice.indexed.count() == once.indexed.count())
    val none = model.remove(emb.select($"vec_id"), "vec_id")
    assert(none.indexed.count() == 0)
    assert(none.search(q42, 5).collect().isEmpty)
    // HNSW: tombstoning every id still answers (empty), k-fill contract
    // only applies while live rows remain
    val h = graft.index.HNSW.build(emb.limit(50), "vec_id", "embedding",
        graft.index.HNSWGraph.Params(numLayers = 4, efConstruction = 50,
          efSearch = 32, m = 8), numShards = 2)
      .remove(emb.limit(50).select($"vec_id"), "vec_id")
    assert(h.search(q42, 5).collect().isEmpty)
  }

  test("streaming removals patch the live index (takedown stream)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = graft.index.IVFFlat.build(emb, "vec_id", "embedding",
      graft.index.IVFFlat.Params(k = 8, numAttempts = 1, maxIterations = 5))
    val state = new java.util.concurrent.atomic.AtomicReference(model)
    val mem = MemoryStream[Long]
    val q = graft.streaming.Streaming.ingestRemovals(
      mem.toDF().toDF("vec_id"), state,
      (m: graft.index.IVFFlat.Model, b) => m.remove(b, "vec_id"))
    mem.addData(42L)
    q.processAllAvailable()
    mem.addData(7L, 13L) // second microbatch stacks on the first
    q.processAllAvailable()
    q.stop()
    val live = state.get()
    assert(live.indexed.count() == emb.count() - 3)
    assert(!ids(live.search(q42, 5)).contains(42L))
  }

  test("HNSW.remove: tombstoned id never returned, k results still delivered, survives save/load") {
    val model = graft.index.HNSW.build(emb, "vec_id", "embedding",
      graft.index.HNSWGraph.Params(numLayers = 6, efConstruction = 100,
        efSearch = 64, m = 16), numShards = 4)
    assert(ids(model.search(q42, 5)).head == 42L)
    val after = model.remove(Seq(42L).toDF("vec_id"), "vec_id")
    val got = ids(after.search(q42, 5))
    assert(!got.contains(42L))
    assert(got.length == 5, "soft-delete over-fetch must still fill k")
    // tombstones round-trip persistence
    val dir = java.nio.file.Files.createTempDirectory("hnsw_rm").toString
    after.save(dir)
    val re = graft.index.HNSW.load(spark, dir)
    assert(re.removed == Set(42L))
    assert(!ids(re.search(q42, 5)).contains(42L))
  }
}
