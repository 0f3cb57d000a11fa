package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR; Xie et al. 2023,
  * arXiv:2302.03169) — select raw-corpus documents that look like a
  * small target corpus, using hashed n-gram bag-of-buckets models:
  * cheap enough to score 100 TB (two integer hashes per token) yet
  * measurably better than heuristics at matching a target domain.
  * Extends the reference's surface (vers has no text ops) alongside
  * QualityLR (discriminative) — DSIR is the generative counterpart:
  * no labels, just a target corpus.
  *
  *  1. Features: word unigrams + bigrams, hashed into `m` buckets
  *     ([[Sketches.hash60]], the engine's portable md5 hash).
  *  2. Bucket unigram models with add-one smoothing for the target
  *     and the raw corpus: p(b) = (count_b + 1)/(total + m).
  *  3. Per-document importance weight: log p_target(doc) −
  *     p_raw(doc) = Σ_b count_doc(b) · log(p_t(b)/p_r(b)).
  *
  * Precision contract: the per-bucket log-ratio is the ONLY libm call
  * (one `ln` per bucket, m total — the HLL-estimate concession, same
  * class as sketch_hll's documented ln). It is quantized to a 1e-6
  * BIGINT immediately, so every per-document weight is an INTEGER
  * dot-product of (count, quantized-log-ratio) — order-free,
  * oracle-exact given the m quantized bucket values match.
  *
  * Scale shape: documents tokenize once into (doc, bucket, cnt) —
  * partial-aggregated map-side, ≤ m distinct buckets per doc; the two
  * corpus models shuffle ≤ m rows each; scoring is a bucket-keyed
  * equi-join against a broadcast m-row ratio table. Nothing
  * corpus-sized crosses the wire except the doc→bucket postings.
  */
object Dsir {

  /** Hashed n-gram bucket counts per document: word unigrams + bigrams
    * → md5-bucket in [0, m); output (doc_id, bucket, cnt). Docs with
    * no tokens yield no rows (their weight is 0 by definition — an
    * empty product). m must be a power of two (mask-extracted). */
  def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                  m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= (1 << 20),
      s"m=$m must be a power of two in [2, 2^20]")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val grams = toks.select(col("doc_id"), explode(concat(col("toks"),
      when(size(col("toks")) >= 2,
        zip_with(slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array()))).as("gram"))
    grams.select(col("doc_id"),
        Sketches.hash60(col("gram")).bitwiseAND(lit((m - 1).toLong))
          .cast("int").as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Per-corpus bucket totals: (bucket, `cntName`) summed over a
    * gram-bucket posting frame (the [[gramBuckets]] output shape). */
  private def bucketTotalsOf(gb: DataFrame, cntName: String): DataFrame =
    gb.groupBy("bucket").agg(sum("cnt").as(cntName))

  /** Bucket totals of a raw-text corpus: (bucket, `cntName`), ≤ m
    * rows — the corpus model as a MONOID (per-key sums), which is
    * what makes the streaming target-ingest twin exact. */
  def bucketTotals(corpus: DataFrame, textCol: String, m: Int,
                   cntName: String = "ct"): DataFrame =
    bucketTotalsOf(gramBuckets(
      corpus.select(monotonically_increasing_id().as("__id"), col(textCol)),
      "__id", textCol, m), cntName)

  /** The m-row quantized log-ratio table from two bucket-total frames
    * (target ct, raw cr): (bucket, lr_q) for EVERY bucket in [0, m),
    * lr_q = floor(ln(p_t/p_r)·1e6 + 0.5) with add-one smoothing —
    * absent buckets carry the smoothed floor, exactly as the paper's
    * multinomial requires. Output is broadcast-sized (m rows) and
    * REUSABLE: build it once, score any number of corpora or stream
    * batches against it ([[weightsAgainst]]). */
  def logRatioQOfTotals(t: DataFrame, r: DataFrame, m: Int): DataFrame = {
    val spark = t.sparkSession
    val all = spark.range(m).select(col("id").cast("int").as("bucket"))
    val joined = all.join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    // grand totals ride as one broadcast row; the probability ratio is
    // assembled in a fixed operand order so DuckDB replays it IEEE-
    // step-for-step before its own ln
    val totals = joined.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val pt = (col("ct").cast("double") + lit(1.0d)) /
      (col("tt").cast("double") + lit(m.toDouble))
    val pr = (col("cr").cast("double") + lit(1.0d)) /
      (col("tr").cast("double") + lit(m.toDouble))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(log(pt / pr) * lit(1000000.0d) + lit(0.5d)).cast("long")
          .as("lr_q"))
  }

  /** [[logRatioQOfTotals]] from two raw-text corpora (the standalone
    * face; [[weights]] derives the raw model from its scoring
    * postings instead, saving a second corpus pass). */
  def bucketLogRatioQ(target: DataFrame, targetTextCol: String,
                      raw: DataFrame, rawTextCol: String,
                      m: Int): DataFrame =
    logRatioQOfTotals(bucketTotals(target, targetTextCol, m, "ct"),
      bucketTotals(raw, rawTextCol, m, "cr"), m)

  /** Score documents against a PREBUILT log-ratio table (the serving
    * face — at corpus scale the lr table is built once, broadcast
    * everywhere, and reused across scoring jobs and stream batches):
    * (doc_id, n_grams, weight_q) per doc, gramless docs zero-filled.
    * `gb` pre-tokenized variant below for callers holding postings. */
  def weightsAgainst(docs: DataFrame, idCol: String, textCol: String,
                     lr: DataFrame, m: Int = 256): DataFrame =
    weightsAgainstPostings(docs.select(col(idCol).cast("long").as("doc_id")),
      gramBuckets(docs, idCol, textCol, m), lr)

  /** [[weightsAgainst]] over an already-materialized gram-bucket
    * posting frame (ids = every doc to report, zero-filled when it
    * has no postings). */
  def weightsAgainstPostings(ids: DataFrame, gb: DataFrame,
                             lr: DataFrame): DataFrame = {
    val scored = gb
      .join(broadcast(lr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_grams"),
        sum(col("cnt") * col("lr_q")).as("weight_q"))
    ids.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("weight_q"), lit(0L)).as("weight_q"))
  }

  /** Importance weight per raw document against a target corpus:
    * (doc_id, n_grams, weight_q) for every `docs` row — weight_q the
    * integer dot-product Σ_b cnt_b · lr_q(b), n_grams the hashed gram
    * count (0-gram docs keep weight 0). Higher = more target-like.
    *
    * The corpus tokenizes ONCE: the persisted doc→bucket posting frame
    * feeds both the raw corpus model (a ≤m-row re-aggregation) and the
    * scoring join — only the target (small by construction) gets its
    * own gram pass. */
  def weights(docs: DataFrame, idCol: String, textCol: String,
              target: DataFrame, targetTextCol: String,
              m: Int = 256): DataFrame = {
    // the gram-bucket frame feeds BOTH the raw model and the scoring
    // join as the SAME subplan, whose final groupBy ends in a shuffle
    // — Spark's ReuseExchange dedupes it, so the corpus tokenizes once
    // per evaluation with NO caller-owned cache to leak (DsirSpec
    // gates the reused exchange; previously a .persist() here pinned
    // a corpus-sized frame per weights() call in long-lived sessions)
    val gb = gramBuckets(docs, idCol, textCol, m)
    val lr = logRatioQOfTotals(bucketTotals(target, targetTextCol, m, "ct"),
      bucketTotalsOf(gb, "cr"), m)
    weightsAgainstPostings(
      docs.select(col(idCol).cast("long").as("doc_id")), gb, lr)
  }

  /** Resampled DSIR selection — the paper's actual sampler: Gumbel
    * top-n over the temperature-scaled log-weights, i.e. draw `n`
    * documents WITHOUT replacement with probability proportional to
    * softmax(weight / T). Selecting argmax-n of (weight/T + G_i),
    * G_i ~ Gumbel(0,1), IS that sampler (the Gumbel-top-k trick), and
    * multiplying through by T·1e6 keeps the integer weight intact:
    * score_q = weight_q + floor(T · (−ln(−ln u_i)) · 1e6 + 0.5).
    *
    * u_i is content-addressed ((md5-8hex + 0.5)/2^32 ∈ (0,1) strictly,
    * so the Gumbel is finite) — deterministic per (doc_id, salt),
    * replayable in the oracle, identical across batch and stream.
    * temperature = 0 degenerates to the greedy [[selectTop]] ranking
    * exactly (noise floor-quantizes to 0). The two lns per doc are
    * the sketch_hll concession class, 1e-6-quantized.
    * Output (doc_id, weight_q, score_q, rank). */
  def selectResampled(docs: DataFrame, idCol: String, textCol: String,
                      target: DataFrame, targetTextCol: String,
                      n: Int, m: Int = 256, temperature: Double = 1.0,
                      salt: String = "dsir"): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    require(temperature >= 0.0, s"temperature=$temperature must be >= 0")
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":" + salt))), 1, 8), 16, 10).cast("double") + lit(0.5d)) /
      lit(4294967296.0d)
    val gumbel = lit(0.0d) - log(lit(0.0d) - log(u))
    val scoreQ = (col("weight_q") +
      floor(lit(temperature) * gumbel * lit(1000000.0d) + lit(0.5d))
        .cast("long")).as("score_q")
    val w = Window.orderBy(col("score_q").desc, col("doc_id").asc)
    weights(docs, idCol, textCol, target, targetTextCol, m)
      .select(col("doc_id"), col("weight_q"), scoreQ)
      .orderBy(col("score_q").desc, col("doc_id").asc).limit(n)
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("weight_q"), col("score_q"), col("rank"))
  }

  /** Greedy DSIR selection: the `n` highest-weight documents (ties by
    * doc_id ascending — deterministic). [[selectResampled]] is the
    * paper's softmax sampler; this face is the zero-temperature
    * argmax. Output (doc_id, weight_q, rank). */
  def selectTop(docs: DataFrame, idCol: String, textCol: String,
                target: DataFrame, targetTextCol: String,
                n: Int, m: Int = 256): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    // global top-n via orderBy+limit (TakeOrderedAndProject: bounded
    // per-partition heaps + driver merge — never a one-partition
    // window over the corpus); the rank window then runs on ≤ n rows
    val w = Window.orderBy(col("weight_q").desc, col("doc_id").asc)
    weights(docs, idCol, textCol, target, targetTextCol, m)
      .orderBy(col("weight_q").desc, col("doc_id").asc).limit(n)
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("weight_q"), col("rank"))
  }

  /** [[selectTop]]'s corpus-scale face — identical result (same total
    * (weight_q DESC, doc_id ASC) order, so the same oracle gates it),
    * different movement plan for LARGE `n`. [[selectTop]]'s
    * TakeOrderedAndProject funnels partitions × n rows through ONE
    * merge task (n = 1M at 10M docs already pushed ~192M rows through
    * it — the r11 scale audit's flagged skew), and n grows WITH the
    * corpus in a selection job (select the best 1% of 100 TB).
    *
    * Plan: checkpoint the weight frame once (it feeds the estimate,
    * the filter, and the trim), estimate the rank-n weight τ with a
    * distributed t-digest (approx_percentile at quantile
    * 1 − slack·n/total — `slack` asks deeper than n so the estimate's
    * error can't lose top-n rows), filter weight_q ≥ τ (NARROW — this
    * is the step that shrinks the funnel), verify the survivor count
    * covers n (halving the quantile until it does — ≤ log₂(total/n)
    * cheap re-filters of the checkpointed longs, none in the common
    * case), and only then exactly trim the ~slack·n survivors with
    * orderBy+limit: the merge task now receives ≤ survivors ≈ slack·n
    * rows, corpus-size-independent. Degenerate tie strata (τ shared
    * by a corpus-sized stratum) fall back towards selectTop's funnel
    * — correctness never depends on the estimate. */
  def selectTopThreshold(docs: DataFrame, idCol: String, textCol: String,
                         target: DataFrame, targetTextCol: String,
                         n: Int, m: Int = 256, slack: Double = 1.5)
  : DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    require(slack >= 1.0, s"slack=$slack must be >= 1")
    val wq = weights(docs, idCol, textCol, target, targetTextCol, m)
      .select(col("doc_id"), col("weight_q"))
      .localCheckpoint(true)
    val total = wq.count()
    val w = Window.orderBy(col("weight_q").desc, col("doc_id").asc)
    val survivors =
      if (total <= n) wq
      else {
        var keep = math.min(1.0, slack * n / total.toDouble)
        var cut = wq
        var covered = false
        while (!covered) {
          if (keep >= 1.0) { cut = wq; covered = true }
          else {
            val tau = wq.agg(expr(
                s"approx_percentile(weight_q, ${1.0 - keep}, 10000)"))
              .head().getLong(0)
            cut = wq.filter(col("weight_q") >= lit(tau))
            covered = cut.count() >= n
            keep *= 2
          }
        }
        cut
      }
    survivors.orderBy(col("weight_q").desc, col("doc_id").asc).limit(n)
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("weight_q"), col("rank"))
  }
}
