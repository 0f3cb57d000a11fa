package graft

import org.apache.spark.sql.functions._

import graft.index.{Batches, HNSW, HNSWGraph, IVFPQ, PQ}

/** The driver-collect serving budget (index.Batches): entry points that
  * collect + broadcast their batch must fail FAST on a corpus-sized
  * input, naming the distributed alternative — not OOM the driver hours
  * in. The budget is per-session conf; the spec shrinks it to make a
  * 500-row frame "corpus-sized". */
class ServingGuardSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private def withBudget[A](n: Int)(body: => A): A = {
    spark.conf.set(Batches.MaxBatchKey, n.toString)
    try body finally spark.conf.unset(Batches.MaxBatchKey)
  }

  test("oversized batches fail fast with the distributed alternative named") {
    val p = HNSWGraph.Params(numLayers = 4, efConstruction = 32,
      efSearch = 32, m = 8)
    val hnsw = HNSW.build(emb.filter(col("vec_id") < 64), "vec_id", "embedding",
      p, numShards = 2)
    val cents = SparkEntry.fixedCentroids(emb)
    val sizes = Array.fill(cents.length)(Long.MaxValue)
    val cbs = SparkEntry.fixedCodebooks(emb, 4)
    val pq = PQ.withCodebooks(emb.filter(col("vec_id") < 64), "vec_id",
      "embedding", cbs, PQ.Params(m = 4, k = 16))
    val ivfpq = IVFPQ.build(emb.filter(col("vec_id") < 64), "vec_id",
      "embedding", cents, sizes, cbs, PQ.Params(m = 4, k = 16))

    withBudget(8) {
      val big = emb.filter(col("vec_id") < 32) // 32 > budget of 8
      for ((label, run) <- Seq[(String, () => Any)](
        "hnsw-search" -> (() => hnsw.searchMany(big, "vec_id", "embedding", 3)),
        "hnsw-add" -> (() => hnsw.add(big, "vec_id", "embedding")),
        "hnsw-remove" -> (() => hnsw.remove(big, "vec_id")),
        "pq-search" -> (() => pq.searchMany(big, "vec_id", "embedding", 3)),
        "ivfpq-search" -> (() => ivfpq.searchMany(big, "vec_id", "embedding", 3))
      )) {
        val e = intercept[IllegalArgumentException](run())
        assert(e.getMessage.contains("serving budget"), s"$label: ${e.getMessage}")
        assert(e.getMessage.contains("distributed path"), s"$label message " +
          "must route the caller to the non-collect alternative")
      }
      // within budget everything still serves
      val small = emb.filter(col("vec_id") < 5)
      assert(hnsw.searchMany(small, "vec_id", "embedding", 3).count() > 0)
      assert(pq.searchMany(small, "vec_id", "embedding", 3).count() > 0)
    }
    // default budget is far above any spec-sized frame
    assert(hnsw.searchMany(emb.filter(col("vec_id") < 5), "vec_id",
      "embedding", 3).count() > 0)
  }
}
