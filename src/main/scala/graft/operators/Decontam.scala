package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination by token n-gram overlap (beyond the
  * reference surface — the eval-integrity stage of a pretraining
  * pipeline: a training document sharing long verbatim n-grams with a
  * held-out benchmark is contaminated even when no whole-document
  * near-dup fires).
  *
  * This complements the existing integrity operators: exact/MinHash
  * dedup catch whole-doc copies, [[Splits.crossSplitPairs]] catches
  * near-dup pairs straddling a split, `sketch_bloom_contamination`
  * pre-filters by whole-doc digest — n-gram overlap is the standard
  * finer instrument (GPT-3/PaLM-style "13-gram collision" checks) that
  * catches a benchmark answer quoted INSIDE an otherwise-original page.
  *
  * Scale shape: the benchmark side is takedown-sized relative to the
  * corpus (thousands of eval docs vs billions of pages), so its
  * distinct-gram set broadcasts; the corpus side never shuffles — each
  * doc's grams are generated, hashed, and probed map-side, and the only
  * aggregation is the per-doc counter, which re-uses the doc's own
  * partition (grams carry doc_id, the groupBy key is doc_id: one
  * exchange of (doc_id, two counters), digest-sized). With a benchmark
  * too big to broadcast the same plan degrades to a shuffled left-semi
  * on gram hash — still posting-list-sized, never corpus × benchmark.
  */
object Decontam {

  /** Distinct md5-hashed word n-grams of a MATERIALIZED token column
    * (HOF discipline: `toks` must be a bound attribute, never an inline
    * tokenize expression — the O(d²) re-evaluation trap documented in
    * round 7). */
  private[graft] def gramsOf(toks: Column, n: Int): Column = {
    require(n >= 1, "n-gram order must be >= 1")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => md5(concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
        .otherwise(array().cast("array<string>")))
  }

  private[graft] def gramSets(docs: DataFrame, idCol: String,
                              textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol), gramsOf(col("toks"), n).as("grams"))

  /** Per-candidate-doc contamination profile against `bench`:
    * `n_grams` distinct n-grams, `n_hit` of them present anywhere in
    * the benchmark set, and the overlap ratio. A doc with zero grams
    * (shorter than n tokens) reports 0/0/0.0 — too short to convict.
    *
    * `broadcastBench` pins the benchmark gram set to a broadcast hash
    * join (the intended regime); pass false only when the benchmark
    * side outgrows executor memory.
    */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   n: Int = 8, broadcastBench: Boolean = true): DataFrame =
    ngramOverlapAgainstGrams(docs, idCol, textCol,
      benchGramSet(bench, benchIdCol, benchTextCol, n), n, broadcastBench)

  /** The benchmark's distinct gram set (column `g`) — precompute once
    * and reuse across batches/streams; the benchmark is static while
    * the corpus flows.
    */
  def benchGramSet(bench: DataFrame, benchIdCol: String,
                   benchTextCol: String, n: Int = 8): DataFrame =
    gramSets(bench, benchIdCol, benchTextCol, n)
      .select(explode(col("grams")).as("g")).distinct()

  /** [[ngramOverlap]] against a precomputed [[benchGramSet]]. */
  def ngramOverlapAgainstGrams(docs: DataFrame, idCol: String, textCol: String,
                               benchGrams0: DataFrame, n: Int,
                               broadcastBench: Boolean = true): DataFrame = {
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    val docGrams = gramSets(docs, idCol, textCol, n)
      .select(col(idCol), size(col("grams")).cast("long").as("n_grams"),
        col("grams"))
      .select(col(idCol), col("n_grams"), explode_outer(col("grams")).as("g"))
    docGrams
      .join(benchGrams.withColumn("hit", lit(1L)), Seq("g"), "left")
      .groupBy(col(idCol), col("n_grams"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"),
        when(col("n_grams") > 0,
          col("n_hit").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("overlap"))
  }

  /** The admission face: candidate docs whose overlap ratio is at or
    * above `threshold` (the drop list a decontamination pass emits).
    */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   n: Int = 8, threshold: Double = 0.5): DataFrame =
    ngramOverlap(docs, idCol, textCol, bench, benchIdCol, benchTextCol, n)
      .filter(col("overlap") >= threshold)

  /** Row-local overlap against a LITERAL benchmark gram set — the
    * fully-stateless face for streams and tiny benchmarks: the gram
    * set rides the plan as a literal array (collect it once with
    * `benchGramSet(...).collect()`), so the decision is a pure narrow
    * map — no join, no state store, usable inside a streaming
    * transform with no watermark. Same distinct-gram semantics as
    * [[ngramOverlap]]. Driver-collect contract: benchmark gram sets
    * are takedown-sized; for anything larger use the broadcast-join
    * path.
    */
  def overlapAgainstLiteral(docs: DataFrame, idCol: String, textCol: String,
                            benchGrams: Array[String], n: Int): DataFrame = {
    val benchLit = lit(benchGrams.sorted)
    gramSets(docs, idCol, textCol, n)
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .withColumn("n_hit",
        size(array_intersect(col("grams"), benchLit)).cast("long"))
      .withColumn("overlap", when(col("n_grams") > 0,
        col("n_hit").cast("double") / col("n_grams").cast("double"))
        .otherwise(lit(0.0)))
      .drop("grams")
  }

  /** SPAN-LEVEL contamination map — the surgical face of
    * decontamination: instead of convicting whole documents
    * ([[contaminated]] drops a page because one quoted benchmark
    * answer sits in its middle), locate the contaminated token spans
    * themselves. Each candidate gram POSITION that collides with the
    * benchmark gram set marks tokens [pos, pos+n−1]; maximal runs of
    * consecutive colliding positions merge into one span by the
    * gaps-and-islands rule (pos − row_number, the
    * [[Dedup.repeatedSpans]] machinery pointed across the
    * corpus/benchmark boundary instead of within one corpus). Returns
    * (idCol, start_tok, end_tok, n_grams) — directly consumable by
    * [[Dedup.scrubRepeatedSpans]].
    *
    * Scale shape: same as [[ngramOverlapAgainstGrams]] — the benchmark
    * gram set broadcasts, candidate gram positions probe it map-side,
    * and the only shuffle is the per-doc islands window over HIT
    * positions (contamination-sized, not corpus-sized: clean docs
    * contribute zero rows). */
  def contaminatedSpans(docs: DataFrame, idCol: String, textCol: String,
                        benchGrams0: DataFrame, n: Int,
                        broadcastBench: Boolean = true): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    // distinct BEFORE the probe join: a duplicate gram_h row would make
    // a hit position appear twice, shifting the pos − row_number island
    // key and corrupting every later span in the doc. Free for internal
    // callers ([[benchGramSet]] is already distinct); defensive for
    // caller-supplied frames.
    val benchGrams = (if (broadcastBench) broadcast(benchGrams0)
                      else benchGrams0)
      .select(col("g").as("gram_h")).distinct()
    val pos = docs
      .select(col(idCol).cast("long").as("id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - lit(n)),
        i => md5(concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))))
        .as(Seq("pos", "gram_h")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    pos.join(benchGrams, Seq("gram_h"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("end_tok"),
        count(lit(1)).as("n_grams"))
      .select(col("id").as(idCol), col("start_tok"), col("end_tok"),
        col("n_grams"))
  }

  /** Scrub ONLY the contaminated spans — the curation-grade
    * decontamination: the page survives with the benchmark quote
    * excised, instead of the whole doc dropping ([[contaminated]]'s
    * blunt rule wastes every clean token around a one-line quote).
    * Composes [[contaminatedSpans]] with [[Dedup.scrubRepeatedSpans]];
    * returns (idCol, scrubbed, n_kept) over ALL input docs (clean docs
    * pass through with their full token count). */
  def scrubContaminatedSpans(docs: DataFrame, idCol: String, textCol: String,
                             bench: DataFrame, benchIdCol: String,
                             benchTextCol: String, n: Int = 8,
                             broadcastBench: Boolean = true): DataFrame =
    Dedup.scrubRepeatedSpans(docs, idCol, textCol,
      contaminatedSpans(docs, idCol, textCol,
        benchGramSet(bench, benchIdCol, benchTextCol, n), n, broadcastBench))

  /** ROW-LOCAL span scrub — the streaming face of
    * [[scrubContaminatedSpans]]: the whole pipeline (gram-hit
    * positions → islands → excise) runs inside one narrow map per doc
    * with the benchmark gram set broadcast, because every step is
    * doc-local once the gram set is in hand (no join, no window, no
    * state — usable inside any streaming transform, the
    * [[graft.streaming.Streaming.scrubStream]] discipline). Same
    * md5-gram semantics and island rule as the distributed version
    * (DecontamSpec pins row-local ≡ distributed). Driver-collect
    * contract: benchmark gram sets are takedown-sized — collect them
    * once via `benchGramSet(...).collect()`. */
  def scrubSpansRowLocal(docs: DataFrame, idCol: String, textCol: String,
                         benchGrams: Array[String], n: Int): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(benchGrams.toSet)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val grams = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val toks = text.split("\\s+").filter(_.nonEmpty)
          // hit positions
          val hits = new scala.collection.mutable.ArrayBuffer[Int]()
          var p = 0
          while (p + n <= toks.length) {
            md.reset()
            val hex = md.digest(toks.slice(p, p + n).mkString(" ")
                .getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString
            if (grams.contains(hex)) hits += p
            p += 1
          }
          // islands → covered flags
          val covered = new Array[Boolean](toks.length)
          var i = 0
          while (i < hits.length) {
            var j = i
            while (j + 1 < hits.length && hits(j + 1) == hits(j) + 1) j += 1
            var t = hits(i)
            while (t <= hits(j) + n - 1) { covered(t) = true; t += 1 }
            i = j + 1
          }
          val kept = toks.indices.filter(!covered(_)).map(toks)
          (id, kept.mkString(" "), kept.length.toLong)
        }
      }
      .toDF(idCol, "scrubbed", "n_kept")
  }

  /** FUZZY decontamination via MinHash bands — the paraphrase-robust
    * complement to [[ngramOverlap]]: exact n-gram collision misses a
    * benchmark answer that was lightly rewritten, but a rewrite that
    * preserves most shingles still collides in MinHash band space
    * (the same S-curve that powers near-dup detection, pointed
    * across the candidate/benchmark boundary instead of within one
    * corpus). Returns (idCol, bench_id, n_bands) per colliding pair —
    * n_bands/numBands estimates the Jaccard similarity region.
    *
    * Scale shape: both sides reduce to band signatures (numBands rows
    * per doc); the benchmark signature set is takedown-sized and
    * broadcasts, so this is a map-side join against the candidate
    * band stream — the corpus never shuffles, same contract as
    * [[ngramOverlapAgainstGrams]].
    */
  def fuzzyMinhash(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   numHashes: Int = 12, bandSize: Int = 2,
                   broadcastBench: Boolean = true): DataFrame = {
    val cb = Dedup.minhashBands(docs, idCol, textCol, numHashes, bandSize)
    val bb0 = Dedup.minhashBands(bench, benchIdCol, benchTextCol,
        numHashes, bandSize)
      .select(col("band"), col("key"), col("id").as("bench_id"))
    val bb = if (broadcastBench) broadcast(bb0) else bb0
    cb.join(bb, Seq("band", "key"))
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("n_bands"))
      .select(col("id").as(idCol), col("bench_id"), col("n_bands"))
  }
}
