package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("conditional probabilities normalize: sum over observed + unseen mass = 1") {
    val docs = Seq((1L, "a b a c"), (2L, "a b")).toDF("id", "text")
    val (uni, big, v) = LangModel.train(docs, "id", "text")
    // contexts: doc1 -> (a,b),(b,a),(a,c); doc2 -> (a,b)
    val c1 = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1 == Map("a" -> 3L, "b" -> 1L))
    val c2 = big.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(c2 == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))
    assert(v == 3L)
    // add-one: sum_w2 p(w2|'a') = (c2(a,b)+1 + c2(a,c)+1 + c2(a,a)+1) / (3+3) = 1
    val pa = (2 + 1 + 1 + 1 + 0 + 1).toDouble / (3 + 3)
    assert(math.abs(pa - 1.0) < 1e-12)
  }

  test("in-domain repetition scores above out-of-domain word salad") {
    val corpus = (1L to 40L).map(i => (i, "spark reads parquet files fast"))
      .toDF("id", "text")
    val probe = Seq((100L, "spark reads parquet files fast"),
      (101L, "zebra quantum violet mango acoustic")).toDF("id", "text")
    val (uni, big, v) = LangModel.train(corpus, "id", "text")
    val s = LangModel.score(probe, "id", "text", uni, big, v)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s(100L)._1 == 4L && s(101L)._1 == 4L)
    // in-domain transitions score (c+1)/(c1+V) ≈ 0.91; unseen words get
    // the smoothing floor 1/V = 0.2 — a 4.5x likelihood gap
    assert(s(100L)._2 > 3 * s(101L)._2,
      s"in-domain ${s(100L)._2} should dwarf ood ${s(101L)._2}")
  }

  test("degenerate docs: empty and single-token score 0/0; stable under repartition") {
    val docs = Seq((1L, ""), (2L, "lonely"), (3L, "a b c")).toDF("id", "text")
    val a = LangModel.selfScore(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a(1L) == ((0L, 0L)) && a(2L) == ((0L, 0L)))
    assert(a(3L)._1 == 2L && a(3L)._2 > 0L)
    val b = LangModel.selfScore(docs.repartition(7), "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
  }
}
