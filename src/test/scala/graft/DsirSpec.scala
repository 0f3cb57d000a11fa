package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Gates for DSIR hashed n-gram importance weighting: target-like
  * documents must outrank off-domain ones, the weight must be the
  * integer dot-product of bucket counts and quantized log-ratios, and
  * degenerate docs must not crash or skew. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  private val target = Seq(
    "spark shuffle partition executor",
    "executor shuffle spark stage partition",
    "partition stage executor spark shuffle").toDF("text")

  private val raw = Seq(
    // on-domain, in target word order: with corpora this tiny, even ONE
    // bigram absent from the target outweighs several matching grams
    // (absent buckets carry the full smoothed negative log-ratio), so
    // the positive fixtures reuse target phrasing verbatim
    (0L, "spark shuffle partition executor"),
    (1L, "banana smoothie recipe with mango"),      // off-domain
    (2L, "spark shuffle banana recipe"),            // mixed
    (3L, ""),                                       // empty
    // on-domain in target WORD ORDER — bigrams carry half the mass, so
    // a scrambled "executor partition shuffle spark" scores NEGATIVE
    // (its bigrams never occur in the target); that is correct DSIR
    // behavior, not a bug, and the fixture respects it
    (4L, "executor shuffle spark stage partition")
  ).toDF("doc_id", "text")

  test("weights rank on-domain docs above mixed above off-domain; empty doc is 0") {
    val w = Dsir.weights(raw, "doc_id", "text", target, "text", m = 256)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("weight_q"))).toMap
    assert(w.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(w(3L) == ((0L, 0L)))
    val wt = w.view.mapValues(_._2)
    assert(wt(0L) > wt(2L) && wt(4L) > wt(2L), s"on-domain not above mixed: $w")
    assert(wt(2L) > wt(1L), s"mixed not above off-domain: $w")
    assert(wt(1L) < 0L, s"off-domain should be negative-log-ratio: $w")
  }

  test("weight is the integer dot-product of gramBuckets and bucketLogRatioQ") {
    val gb = Dsir.gramBuckets(raw, "doc_id", "text", m = 256)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[Long]("cnt")))
    val lr = Dsir.bucketLogRatioQ(target, "text", raw, "text", m = 256)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("lr_q"))
      .toMap
    assert(lr.size == 256) // every bucket present, absent ones smoothed
    val manual = gb.groupBy(_._1).view
      .mapValues(_.map { case (_, b, c) => c * lr(b) }.sum).toMap
    val w = Dsir.weights(raw, "doc_id", "text", target, "text", m = 256)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_q"))
      .toMap
    gb.map(_._1).distinct.foreach(d => assert(w(d) == manual(d), s"doc $d"))
  }

  test("gramBuckets counts unigrams + bigrams; single-token doc has no bigram") {
    val one = Seq((7L, "solo")).toDF("doc_id", "text")
    val n = Dsir.gramBuckets(one, "doc_id", "text", m = 16)
      .agg(sum("cnt")).head().getLong(0)
    assert(n == 1L)
    val two = Seq((8L, "a b")).toDF("doc_id", "text")
    val n2 = Dsir.gramBuckets(two, "doc_id", "text", m = 16)
      .agg(sum("cnt")).head().getLong(0)
    assert(n2 == 3L) // a, b, "a b"
  }

  test("selectTop returns the n best, deterministically ranked") {
    val got = Dsir.selectTop(raw, "doc_id", "text", target, "text",
      n = 2, m = 256).orderBy("rank").collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(0L, 4L)))
    assert(got.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    val again = Dsir.selectTop(raw, "doc_id", "text", target, "text",
      n = 2, m = 256).orderBy("rank").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("weights run on the real documents table: en target lifts en docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tgt = docs.filter(col("lang") === "en").select("text")
    val w = Dsir.weights(docs, "doc_id", "text", tgt, "text", m = 256)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val means = w.groupBy("lang")
      .agg(avg(col("weight_q").cast("double")).as("mean_w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the en mean importance weight must exceed every other language's
    val others = means.filter(_._1 != "en").values
    assert(others.forall(_ < means("en")),
      s"en target did not lift en docs: $means")
  }
}
