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

  test("selectTopThreshold == selectTop at every n, including n > corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tgt = docs.filter(col("lang") === "en")
    for (n <- Seq(1, 7, 50, 1000)) {
      val want = Dsir.selectTop(docs, "doc_id", "text", tgt, "text",
        n = n, m = 256).orderBy("rank").collect().map(_.toSeq).toSeq
      val got = Dsir.selectTopThreshold(docs, "doc_id", "text", tgt, "text",
        n = n, m = 256).orderBy("rank").collect().map(_.toSeq).toSeq
      assert(got == want, s"threshold select diverged at n=$n")
    }
    // tie-heavy degenerate corpus (every weight equal): the τ filter
    // keeps everything and the exact trim must still match
    val ties = (0L until 30L).map(i => (i, "same text every time")).toDF(
      "doc_id", "text")
    val wantT = Dsir.selectTop(ties, "doc_id", "text", ties, "text",
      n = 5, m = 64).orderBy("rank").collect().map(_.toSeq).toSeq
    val gotT = Dsir.selectTopThreshold(ties, "doc_id", "text", ties, "text",
      n = 5, m = 64).orderBy("rank").collect().map(_.toSeq).toSeq
    assert(gotT == wantT)
  }

  test("selectResampled: T=0 == greedy; noise is deterministic; high T moves the set") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tgt = docs.filter(col("lang") === "en").select("text")
    val greedy = Dsir.selectTop(docs, "doc_id", "text", tgt, "text",
        n = 20).orderBy("rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")))
    val t0 = Dsir.selectResampled(docs, "doc_id", "text", tgt, "text",
        n = 20, temperature = 0.0).orderBy("rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")))
    assert(t0.toSeq == greedy.toSeq) // zero noise floor-quantizes away
    val hot1 = Dsir.selectResampled(docs, "doc_id", "text", tgt, "text",
        n = 20, temperature = 50.0).orderBy("rank")
      .collect().map(_.getAs[Long]("doc_id"))
    val hot2 = Dsir.selectResampled(docs, "doc_id", "text", tgt, "text",
        n = 20, temperature = 50.0).orderBy("rank")
      .collect().map(_.getAs[Long]("doc_id"))
    assert(hot1.toSeq == hot2.toSeq) // content-addressed: a SAMPLE, not RNG
    assert(hot1.toSet != greedy.map(_._1).toSet, "hot selection never moved")
    // a different salt draws a different sample
    val salted = Dsir.selectResampled(docs, "doc_id", "text", tgt, "text",
        n = 20, temperature = 50.0, salt = "other").orderBy("rank")
      .collect().map(_.getAs[Long]("doc_id"))
    assert(salted.toSet != hot1.toSet)
  }

  test("weights == brute-force reference on a seeded random corpus") {
    // straight-line Scala mirror of the whole pipeline: md5-hash60
    // bucket of every unigram+bigram, add-one smoothed models, ln
    // quantized at 1e-6, integer dot product — pins hashing, bigram
    // formation, smoothing of ABSENT buckets, and the operand order
    val r = new scala.util.Random(0xD51AL)
    val vocab = Vector("x", "y", "z", "w", "q", "k")
    def randDoc() = Seq.fill(r.nextInt(8))(vocab(r.nextInt(vocab.size)))
    val m = 64
    val rawToks = (0 until 40).map(i => i.toLong -> randDoc()).toMap
    val tgtToks = (0 until 8).map(i => i.toLong -> randDoc()).toMap
    val rawDf = rawToks.toSeq.sortBy(_._1)
      .map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text")
    val tgtDf = tgtToks.toSeq.sortBy(_._1)
      .map { case (_, t) => Tuple1(t.mkString(" ")) }.toDF("text")
    val got = Dsir.weights(rawDf, "doc_id", "text", tgtDf, "text", m)
      .collect().map(row => row.getAs[Long]("doc_id") ->
        (row.getAs[Long]("n_grams"), row.getAs[Long]("weight_q"))).toMap
    // brute force
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Int = {
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) & (m - 1)).toInt
    }
    def grams(ts: Seq[String]): Seq[String] =
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    def totals(c: Iterable[Seq[String]]): Map[Int, Long] =
      c.toSeq.flatMap(grams).map(bucket)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = totals(tgtToks.values); val cr = totals(rawToks.values)
    val st = ct.values.sum.toDouble; val sr = cr.values.sum.toDouble
    val lrq: Map[Int, Long] = (0 until m).map { bkt =>
      val pt = (ct.getOrElse(bkt, 0L).toDouble + 1.0) / (st + m.toDouble)
      val pr = (cr.getOrElse(bkt, 0L).toDouble + 1.0) / (sr + m.toDouble)
      bkt -> math.floor(math.log(pt / pr) * 1000000.0 + 0.5).toLong
    }.toMap
    val want = rawToks.map { case (d, ts) =>
      val bs = grams(ts).map(bucket)
      d -> (bs.size.toLong, bs.map(lrq).sum)
    }
    assert(got == want)
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

  test("weights leaves NO cached blocks and reuses the gram-bucket exchange") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tgt = docs.filter(col("lang") === "en").select("text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Dsir.weights(docs, "doc_id", "text", tgt, "text", m = 256)
    df.collect()
    // the corpus gram-bucket frame feeds the raw model AND the scoring
    // join; the dedup is ReuseExchange, NOT a caller-leaked .persist()
    // (the r10 ADVICE item: every weights() call pinned a corpus-sized
    // cached frame for the life of the session)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "Dsir.weights must not leave persisted frames behind")
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: flat(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: flat(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r +: flat(r.child)
      case _ => p +: p.children.flatMap(flat)
    }
    val nodes = flat(df.queryExecution.executedPlan)
    assert(nodes.exists(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec]
          || n.toString.startsWith("ShuffleQueryStage") && n.toString.contains("reuse")),
      "gram-bucket exchange must be reused, not recomputed:\n" +
        df.queryExecution.executedPlan.toString.take(1500))
  }
}
