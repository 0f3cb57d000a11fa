package graft

import org.apache.spark.sql.functions._

import graft.operators.{Exhaustive, TextOps}

class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("identical token multisets embed identically; order-insensitive") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),   // permuted — same multiset
      (3L, "alpha beta gamma epsilon")) // one token differs
      .toDF("id", "text")
      .select($"id", TextOps.hashEmbedding(TextOps.tokens($"text"), 16).as("e"))
    val m = df.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
    assert(m(1L).length == 16)
    // total mass = signed token count: |sum of entries| <= n_tokens
    assert(m(1L).map(math.abs).sum <= 4L)
  }

  test("knn over hash embeddings surfaces a planted near-copy as nearest neighbor") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").limit(100)
    val offset = 10000L
    // planted copy of doc 7 with one appended token
    val planted = base.filter($"doc_id" === 7)
      .select(lit(offset).as("doc_id"), concat($"text", lit(" extraword")).as("text"))
    val corpus = base.unionByName(planted)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id",
        TextOps.hashEmbedding($"toks", 32).cast("array<float>").as("e"))
      .cache()
    val hits = Exhaustive.knnJoin(
        corpus.filter($"doc_id" === offset), "doc_id", "e",
        corpus.filter($"doc_id" < offset), "doc_id", "e",
        k = 1, metric = "sqdist")
      .collect()
    assert(hits.length == 1 && hits(0).getAs[Long]("id") == 7L,
      hits.mkString(","))
  }

  test("the embedding fold is a narrow map: no shuffle below the explode") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextOps.hashEmbedding(TextOps.tokens($"text"), 16).as("e"))
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty)
  }
}
