package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq ==
      Seq("ab", "ab"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
    assert(Bpe.applyMerges("abab", Array(("a", "b"), ("ab", "ab"))).toSeq ==
      Seq("abab"))
  }

  test("train produces deterministic merges and stops when exhausted") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aa ab"))
      .toDF("doc_id", "text")
    // word freqs: aa×3, ab×2 → pairs (a,a)=3, (a,b)=2 → merge (a,a),
    // then (a,b)→ab; then every word is a single symbol → exhausted
    val ms = Bpe.train(docs, "text", numMerges = 10)
    assert(ms.map(m => (m.step, m.left, m.right, m.freq)) ==
      Seq((1, "a", "a", 3L), (2, "a", "b", 2L)))
    // deterministic across runs
    assert(Bpe.train(docs, "text", numMerges = 10) == ms)
  }

  test("tie-break picks the lexicographically smallest pair") {
    val docs = Seq((1L, "xy ab")).toDF("doc_id", "text")
    // (x,y) and (a,b) both freq 1 → (a,b) wins
    val ms = Bpe.train(docs, "text", numMerges = 1)
    assert(ms.head.left == "a" && ms.head.right == "b")
  }

  test("encode applies the trained table in order over the corpus") {
    val docs = Seq((1L, "banana band"), (2L, "")).toDF("doc_id", "text")
    val ms = Seq(("a", "n"), ("b", "an"))
    val got = Bpe.encode(docs, "doc_id", "text", ms)
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    // banana: [b,a,n,a,n,a] -(a,n)-> [b,an,an,a] -(b,an)-> [ban,an,a]
    // band:   [b,a,n,d]     -(a,n)-> [b,an,d]    -(b,an)-> [ban,d]
    assert(got == Seq(
      (1L, Seq("ban", "an", "a", "ban", "d")),
      (2L, Seq.empty[String])))
  }

  test("word cap keeps the (freq DESC, word ASC) head") {
    val docs = Seq((1L, "b b c c a")).toDF("doc_id", "text")
    val words = Bpe.wordCounts(docs, "text", maxWords = 2)
      .as[(String, Long)].collect().toSeq
    assert(words == Seq(("b", 2L), ("c", 2L)))
  }

  test("save/load round-trips the merge table in training order") {
    val docs = Seq((1L, "abab abab cdcd")).toDF("doc_id", "text")
    val ms = Bpe.train(docs, "text", numMerges = 4, maxWords = 10)
    val dir = java.nio.file.Files.createTempDirectory("bpem")
      .resolve("m").toString
    Bpe.save(ms, spark, dir)
    val back = Bpe.load(spark, dir)
    assert(back == ms)
    // loaded merges encode identically
    val pairs = ms.map(m => (m.left, m.right))
    val backPairs = back.map(m => (m.left, m.right))
    assert(Bpe.applyMerges("ababcd", backPairs.toArray).toSeq ==
      Bpe.applyMerges("ababcd", pairs.toArray).toSeq)
  }

  test("load refuses a corpus-sized table under the driver-collect budget") {
    // mis-pointing load at a big parquet must fail fast (Batches), not
    // collect unbounded rows driver-side
    val dir = java.nio.file.Files.createTempDirectory("bpebig")
      .resolve("m").toString
    (0 until 64).map(i => (i, s"l$i", s"r$i", i.toLong))
      .toDF("step", "lhs", "rhs", "freq").write.parquet(dir)
    spark.conf.set(graft.index.Batches.MaxBatchKey, "16")
    try {
      val e = intercept[IllegalArgumentException](Bpe.load(spark, dir))
      assert(e.getMessage.contains("Bpe.save"), e.getMessage)
    } finally spark.conf.unset(graft.index.Batches.MaxBatchKey)
    // within budget the same table loads
    assert(Bpe.load(spark, dir).length == 64)
  }
}
