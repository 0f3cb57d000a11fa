package graft

import org.apache.spark.sql.functions._

import graft.index.Residency
import graft.operators.{LateInteraction, Retrieval}

/** The serving-residency verbs (index.Residency + the tiers' warm/cool
  * faces): warm must make a tier's big frame resident and change NO
  * result; cool must release every storage handle — including the
  * checkpoint blocks DataFrame.unpersist never reaches — and a
  * cache-backed tier must still serve (recompute) afterwards. */
class ResidencySpec extends SparkSpec {

  import spark.implicits._

  private val r = new scala.util.Random(0x5EED5L)
  private def vec() = Array.fill(8)((r.nextInt(21) - 10).toDouble)
  private lazy val dToks = (for {
    d <- 0 until 40; t <- 0 until 4
  } yield (d.toLong, t.toLong, vec())).toDF("doc_id", "tok_idx", "vec")
  private lazy val qToks = (for {
    q <- 0 until 4; t <- 0 until 3
  } yield (q.toLong, t.toLong, vec())).toDF("qid", "tok_idx", "vec")

  private def params = graft.index.IVFFlat.Params(k = 4, numAttempts = 1,
    maxIterations = 4)

  private def served(idx: LateInteraction.TokenIvf): Seq[(Long, Long, Long)] =
    LateInteraction.maxSimIvf(qToks, "qid", "tok_idx", "vec",
        dToks, "doc_id", "vec", idx, k = 5, m = 1024, nprobe = 4)
      .select("qid", "doc_id", "rank").as[(Long, Long, Long)]
      .collect().sortBy(t => (t._1, t._3)).toSeq

  test("warm on a loaded tier: frame becomes resident, results unchanged, idempotent") {
    val built = LateInteraction.buildTokenIvf(dToks, "doc_id", "tok_idx",
      "vec", params)
    val expect = served(built)
    val dir = java.nio.file.Files.createTempDirectory("residency").toString
    built.save(dir)
    built.cool()
    val loaded = LateInteraction.loadTokenIvf(spark, dir)
    assert(!Residency.isResident(loaded.ivf.indexed),
      "a freshly loaded tier is a plain parquet scan")
    val warmed = loaded.warm()
    assert(Residency.isResident(warmed.ivf.indexed),
      "warm must leave the indexed frame holding storage")
    assert(served(warmed) == expect, "warm must not change results")
    warmed.warm() // idempotent: second warm is a touch, not a re-persist
    assert(served(warmed) == expect)
    warmed.cool()
    assert(!Residency.isResident(warmed.ivf.indexed))
    // cache-backed (persist) frames recompute after cool: still correct
    assert(served(warmed) == expect, "a cooled persist-backed tier recomputes")
  }

  test("TokenIvf.compress materializes codes eagerly; float tier coolable after") {
    val built = LateInteraction.buildTokenIvf(dToks, "doc_id", "tok_idx",
      "vec", params)
    val sq8 = built.compress()
    assert(Residency.isResident(sq8.sq8.codes),
      "compress must leave the code table resident (computed once, not per-serve)")
    val expect = LateInteraction.maxSimSq8(qToks, "qid", "tok_idx", "vec",
        dToks, "doc_id", "vec", sq8, k = 5, m = 1024, nprobe = 4)
      .select("qid", "doc_id", "rank").as[(Long, Long, Long)]
      .collect().sortBy(t => (t._1, t._3)).toSeq
    // the lean point: drop the float tier, compressed serving unaffected
    built.cool()
    assert(!Residency.isResident(built.ivf.indexed))
    val after = LateInteraction.maxSimSq8(qToks, "qid", "tok_idx", "vec",
        dToks, "doc_id", "vec", sq8, k = 5, m = 1024, nprobe = 4)
      .select("qid", "doc_id", "rank").as[(Long, Long, Long)]
      .collect().sortBy(t => (t._1, t._3)).toSeq
    assert(after == expect)
    sq8.cool()
    assert(!Residency.isResident(sq8.sq8.codes))
  }

  test("cool on a checkpoint-backed tier frees the checkpoint blocks") {
    val built = LateInteraction.buildTokenIvf(dToks, "doc_id", "tok_idx",
      "vec", params)
    val pqTier = built.compressPq(graft.index.PQ.Params(m = 3, k = 4,
      iterations = 2, seed = 7L))
    // trainWithCoarse localCheckpoints the codes — resident via the
    // checkpoint handle, invisible to DataFrame.storageLevel
    assert(Residency.isResident(pqTier.pq.codes))
    val before = spark.sparkContext.getPersistentRDDs.size
    pqTier.cool()
    assert(!Residency.isResident(pqTier.pq.codes),
      "cool must reach checkpoint blocks (the handle unpersist lacks)")
    assert(spark.sparkContext.getPersistentRDDs.size < before,
      "the checkpoint RDD must leave the persistent-RDD registry")
    built.cool()
  }

  test("HNSW and LSHForest residency verbs: warm resident + results unchanged, cool releases") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 64)
    val q = emb.filter(col("vec_id") < 5)
    val hnsw = graft.index.HNSW.build(emb, "vec_id", "embedding",
      graft.index.HNSWGraph.Params(numLayers = 4, efConstruction = 32,
        efSearch = 32, m = 8), numShards = 2)
    val hExpect = hnsw.searchMany(q, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSet
    hnsw.warm()
    assert(Residency.isResident(hnsw.shards))
    assert(hnsw.searchMany(q, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSet == hExpect)
    hnsw.cool()
    assert(!Residency.isResident(hnsw.shards))
    val lsh = graft.index.LSHForest.build(emb, "vec_id", "embedding",
      graft.index.LSHForest.Params(numTrees = 4, maxNodeSize = 16))
    val lExpect = lsh.searchMany(q, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSet
    lsh.warm()
    assert(Residency.isResident(lsh.indexed))
    assert(lsh.searchMany(q, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSet == lExpect)
    lsh.cool()
    assert(!Residency.isResident(lsh.indexed))
  }

  test("Bm25Index warm/cool round-trip on a loaded index") {
    val docs = Seq((1L, "spark shuffles partitions"),
      (2L, "spark caches blocks"), (3L, "postings warm blocks"))
      .toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("residencybm").toString
    idx.save(dir)
    idx.cool()
    val loaded = Retrieval.loadIndex(spark, dir)
    val q = Seq((0L, "spark blocks")).toDF("qid", "text")
    val expect = loaded.searchTopK(q, "qid", "text", k = 3)
      .select("qid", "doc_id", "rank").as[(Long, Long, Int)]
      .collect().sortBy(_._3).toSeq
    assert(!Residency.isResident(loaded.postings))
    val warmed = loaded.warm()
    assert(Residency.isResident(warmed.postings))
    val got = warmed.searchTopK(q, "qid", "text", k = 3)
      .select("qid", "doc_id", "rank").as[(Long, Long, Int)]
      .collect().sortBy(_._3).toSeq
    assert(got == expect)
    warmed.cool()
    assert(!Residency.isResident(warmed.postings))
  }
}
