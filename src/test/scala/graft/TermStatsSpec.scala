package graft

import org.apache.spark.sql.functions._

import graft.operators.TermStats

class TermStatsSpec extends SparkSpec {

  test("tfidfTopTerms: hand-computed scores, rare terms outrank stopwords") {
    import spark.implicits._
    // 4 docs; "the" appears in all (df=4), "zebra" in one (df=1)
    val docs = Seq(
      (1L, "the zebra the the"),
      (2L, "the cat"),
      (3L, "the cat cat"),
      (4L, "the dog")
    ).toDF("doc_id", "text")
    val out = TermStats.tfidfTopTerms(docs, "doc_id", "text", topN = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5)))
      .sortBy(t => (t._1, t._6))
    // doc 1: zebra tf=1 df=1 → 1*(4-1+0.5)/(1.5) = 7/3; the tf=3 df=4 →
    // 3*(4-4+0.5)/4.5 = 1/3 → zebra ranks first despite tf 1 vs 3
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq("zebra", "the"))
    assert(d1.head._5 == 1.0 * (4.0 - 1.0 + 0.5) / (1.0 + 0.5))
    assert(d1(1)._5 == 3.0 * (4.0 - 4.0 + 0.5) / (4.0 + 0.5))
    // doc 3: cat tf=2 df=2 → 2*(2.5/2.5)=2.0 beats the
    val d3 = out.filter(_._1 == 3L)
    assert(d3.head._2 == "cat" && d3.head._5 == 2.0)
    // topN bound respected everywhere
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
  }

  test("sourceCap: per-source bound, winners match the window ranking") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val capped = TermStats.sourceCap(docs, "doc_id", "source", "text", cap = 7)
    val bySrc = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.forall(_ <= 7))
    // any source with >= 7 docs is filled to exactly 7
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(bySrc.getOrElse(src, 0L) == math.min(n, 7L), s"source $src") }
    // the heap-fold winners equal the window-rank reference bit-for-bit
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(md5(col("text")).asc, col("doc_id").asc)
    val ref = docs.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 7).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == ref)
  }

  test("prefixSourceCap: first cap ids per source, matches window ranking") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = TermStats.prefixSourceCap(docs, "doc_id", "source", cap = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id").asc)
    val ref = docs.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 7).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == ref)
  }

  test("repetitionProfile: hand-computed bigram ratios; short docs report zeros") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),  // grams: "a b","b a","a b","b a" → 4 total, 2 distinct, top 2
      (2L, "x y z"),      // grams: "x y","y z" → 2 total, 2 distinct, top 1
      (3L, "w"),          // no bigram
      (4L, "")            // no token at all
    ).toDF("doc_id", "text")
    val out = TermStats.repetitionProfile(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(1L) == ((4L, 2L, 2L, 0.5, 0.5)))
    assert(out(2L) == ((2L, 2L, 1L, 0.5, 0.0)))
    assert(out(3L) == ((0L, 0L, 0L, 0.0, 0.0)))
    assert(out(4L) == ((0L, 0L, 0L, 0.0, 0.0)))
  }
}
