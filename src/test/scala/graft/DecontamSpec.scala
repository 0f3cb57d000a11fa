package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontam

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs")
  ).toDF("id", "text")

  test("a verbatim copy of a benchmark doc reports full overlap") {
    val cand = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // full copy
      (11L, "completely unrelated words about data processing pipelines here"),
      (12L, "he said the quick brown fox jumps over whatever") // partial quote
    ).toDF("id", "text")
    val r = Decontam.ngramOverlap(cand, "id", "text", bench, "id", "text", n = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(10L) == ((7L, 7L, 1.0)))
    assert(r(11L)._2 == 0L && r(11L)._3 == 0.0)
    // "the quick brown", "quick brown fox", "brown fox jumps", "fox jumps over"
    assert(r(12L)._2 == 4L && r(12L)._1 == 7L)
  }

  test("contaminated() applies the threshold; short docs never convict") {
    val cand = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"),
      (21L, "fox jumps"),            // < n tokens: 0 grams
      (22L, "other stuff entirely without any benchmark echo at all")
    ).toDF("id", "text")
    val hit = Decontam.contaminated(cand, "id", "text", bench, "id", "text",
      n = 3, threshold = 0.5).select("id").as[Long].collect().toSet
    assert(hit == Set(20L))
    val all = Decontam.ngramOverlap(cand, "id", "text", bench, "id", "text", n = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(all(21L) == 0L) // present in output, zero grams
  }

  test("duplicate grams within a doc count once (distinct-gram semantics)") {
    val cand = Seq((30L, "the quick brown fox the quick brown fox")).toDF("id", "text")
    val r = Decontam.ngramOverlap(cand, "id", "text", bench, "id", "text", n = 3)
      .head()
    // 6 positional grams but only 4 distinct; 2 of them are benchmark grams
    // ("the quick brown", "quick brown fox")
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
  }

  test("fuzzyMinhash catches a light paraphrase the exact 8-gram check misses") {
    // benchmark doc with enough tokens for stable minhash signatures
    val benchDoc = (1 to 40).map(i => s"tok$i").mkString(" ")
    // paraphrase: every 10th token replaced — no 8-gram survives intact,
    // but ~90% of shingles do, so MinHash bands still collide
    val para = (1 to 40).map(i =>
      if (i % 10 == 0) s"alt$i" else s"tok$i").mkString(" ")
    val b = Seq((900L, benchDoc)).toDF("id", "text")
    val cand = Seq((10L, para),
      (11L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("id", "text")
    val exact = Decontam.ngramOverlap(cand, "id", "text", b, "id", "text", n = 8)
      .filter($"overlap" >= 0.5).select("id").as[Long].collect().toSet
    assert(!exact.contains(10L), "paraphrase should evade the exact check")
    val fuzzy = Decontam.fuzzyMinhash(cand, "id", "text", b, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fuzzy.exists(t => t._1 == 10L && t._2 == 900L && t._3 >= 1),
      fuzzy.mkString(","))
    assert(!fuzzy.exists(_._1 == 11L), "unrelated doc must not collide")
  }

  test("benchmark side plans as a broadcast join — corpus text never shuffles wide") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = Decontam.ngramOverlap(
      docs.filter($"doc_id" % 97 =!= 0), "doc_id", "text",
      docs.filter($"doc_id" % 97 === 0), "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast of the benchmark gram set:\n$plan")
  }

  test("span scrub excises exactly the planted benchmark quote, keeps the rest") {
    import spark.implicits._
    // bench doc = the quote; candidate 1 embeds it mid-page, candidate
    // 2 is clean, candidate 3 is the quote twice with clean gaps
    val quote = "the quick brown fox jumps over lazy dogs"
    val bench = Seq((0L, quote)).toDF("doc_id", "text")
    val pre = "alpha beta gamma delta epsilon"
    val post = "zeta eta theta iota kappa"
    val cand = Seq(
      (1L, s"$pre $quote $post"),
      (2L, s"$pre $post"),
      (3L, s"$quote one two three four five six seven $quote"))
      .toDF("doc_id", "text")
    val spans = Decontam.contaminatedSpans(cand, "doc_id", "text",
        Decontam.benchGramSet(bench, "doc_id", "text", 3), n = 3)
      .select($"doc_id", $"start_tok", $"end_tok")
      .as[(Long, Long, Long)].collect().toSet
    // quote = 8 tokens; in doc 1 it occupies positions 5..12
    assert(spans == Set((1L, 5L, 12L), (3L, 0L, 7L), (3L, 15L, 22L)), spans)
    val scrubbed = Decontam.scrubContaminatedSpans(cand, "doc_id", "text",
        bench, "doc_id", "text", n = 3)
      .select($"doc_id", $"scrubbed", $"n_kept")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(scrubbed(1L) == (s"$pre $post", 10L), scrubbed(1L))
    assert(scrubbed(2L) == (s"$pre $post", 10L))
    assert(scrubbed(3L) == ("one two three four five six seven", 7L))
    // the row-local (streaming-safe) face is semantics-identical
    val grams = Decontam.benchGramSet(bench, "doc_id", "text", 3)
      .as[String].collect()
    val local = Decontam.scrubSpansRowLocal(cand, "doc_id", "text", grams, 3)
      .select($"doc_id", $"scrubbed", $"n_kept")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(local == scrubbed, s"row-local $local vs distributed $scrubbed")
  }

  test("row-local scrub equals the distributed scrub on real corpus text") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val cand = docs.filter($"doc_id" % 97 =!= 0)
    val bench = docs.filter($"doc_id" % 97 === 0)
    val dist = Decontam.scrubContaminatedSpans(cand, "doc_id", "text",
        bench, "doc_id", "text", n = 3)
      .select($"doc_id", $"scrubbed", $"n_kept")
      .as[(Long, String, Long)].collect().toSet
    val grams = Decontam.benchGramSet(bench, "doc_id", "text", 3)
      .as[String].collect()
    val local = Decontam.scrubSpansRowLocal(cand, "doc_id", "text", grams, 3)
      .select($"doc_id", $"scrubbed", $"n_kept")
      .as[(Long, String, Long)].collect().toSet
    assert(local == dist)
    assert(dist.nonEmpty)
  }
}
