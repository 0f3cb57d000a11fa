package graft

import org.apache.spark.sql.functions._

import graft.index.PQ
import graft.operators.Exhaustive

class PQSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private lazy val model = PQ.train(emb, "vec_id", "embedding",
    PQ.Params(m = 16, k = 128, iterations = 10))

  private lazy val truth = {
    val queries = emb.filter(col("vec_id") < 20)
    Exhaustive.knnJoin(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recallOf(got: Map[Long, Set[Long]]): Double =
    truth.keys.toSeq
      .map(q => got.getOrElse(q, Set.empty).intersect(truth(q)).size / 10.0)
      .sum / truth.size

  test("codes are m bytes per vector; one per corpus row") {
    val rows = model.codes.collect()
    assert(rows.length == emb.count())
    rows.foreach(r => assert(r.getAs[Array[Byte]]("code").length == 16))
  }

  test("incremental add encodes identically to encoding in the build (Index::add)") {
    // frozen-codebook add: the held-out row's code must be byte-identical
    // to what the same codebooks produce when it is present from the start
    val incr = graft.index.PQ.withCodebooks(
        emb.filter(col("vec_id") =!= 42), "vec_id", "embedding",
        model.codebooks, model.params)
      .add(emb.filter(col("vec_id") === 42), "vec_id", "embedding")
    val full = graft.index.PQ.withCodebooks(emb, "vec_id", "embedding",
      model.codebooks, model.params)
    def codesOf(m: graft.index.PQ.Model) = m.codes.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code").toSeq).toMap
    assert(codesOf(incr) == codesOf(full))
  }

  test("ADC recall@10 >= 0.6; exact re-rank lifts it >= 0.9") {
    val queries = emb.filter(col("vec_id") < 20)
    val adc = model.searchMany(queries, "vec_id", "embedding", 10)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rAdc = recallOf(adc)
    assert(rAdc >= 0.6, s"ADC recall@10 = $rAdc")
    val refined = model.searchManyRefined(queries, "vec_id", "embedding",
        k = 10, factor = 4, emb, "vec_id", "embedding")
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rRef = recallOf(refined)
    assert(rRef >= 0.9, s"refined recall@10 = $rRef")
    assert(rRef >= rAdc)
  }

  test("training is deterministic: same seed, same codebooks and codes") {
    val again = PQ.train(emb, "vec_id", "embedding",
      PQ.Params(m = 16, k = 128, iterations = 10))
    model.codebooks.zip(again.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    }
    val c1 = model.codes.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val c2 = again.codes.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(c1 == c2)
  }

  test("query-batch chunking does not change results") {
    // chunks partition the QUERIES (not candidates), so any chunk size
    // must produce the identical per-query top-k — this is the task-
    // memory bound: LUT memory is qChunk × m × k × 8 B, never the batch
    val queries = emb.filter(col("vec_id") < 100)
    def run(qChunk: Int) =
      model.searchMany(queries, "vec_id", "embedding", 10, qChunk = qChunk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(7) == run(100000))
  }

  test("save/load round-trip preserves search results") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    model.save(dir)
    val re = PQ.load(spark, dir)
    assert(re.params == model.params && re.dim == model.dim)
    val queries = emb.filter(col("vec_id") === 13)
    val before = model.searchMany(queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._3)
    val after = re.searchMany(queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._3)
    assert(before.sameElements(after))
  }
}
