package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-splitting operators for training-data pipelines
  * (beyond the reference surface — vers is vectors-only — per the
  * driver's north star).
  *
  * Both operators are content-addressed, not sampled: the same doc gets
  * the same split/bin on every run, on any cluster size, under any
  * partitioning — the property that keeps train/test membership stable
  * across a 100 TB corpus's daily rebuilds. No RNG, no
  * `sample()`-style partition sensitivity.
  */
object Splits {

  /** Uniform [0, 1) fraction derived from the id's md5 — the split
    * coordinate. First 8 hex chars as a 32-bit int over 2³²: exact in
    * a double, engine-portable (the oracle reproduces it bit-for-bit).
    */
  private[graft] def hashFrac(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Assign each row a named split by hash fraction: `cuts` are the
    * cumulative upper bounds, e.g. Seq(("train", 0.8), ("val", 0.9),
    * ("test", 1.0)). Pure narrow map — no shuffle, no state; scale-free.
    */
  def assign(df: DataFrame, idCol: String,
             cuts: Seq[(String, Double)] = Seq(
               ("train", 0.8), ("val", 0.9), ("test", 1.0))): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 >= 1.0,
      "last cut must cover the [0,1) fraction space")
    val f = hashFrac(col(idCol))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, ub), rest) => when(f < lit(ub), lit(name)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Group-aware split assignment — leakage-safe splits: every row of
    * the same group (source/domain/site) lands in the SAME split,
    * because the hash coordinate is the group key, not the row id.
    * Near-duplicates overwhelmingly live within a group (same crawl
    * domain, same document family), so group-hashing PREVENTS the
    * train/test contamination that [[crossSplitPairs]] DETECTS —
    * the standard prevention/detection pair of an eval-integrity
    * pipeline. Same narrow no-shuffle shape as [[assign]]; split
    * proportions now hold over groups, not rows (skewed groups skew
    * row counts — that is the semantics, not a bug). */
  def assignByGroup(df: DataFrame, groupCol: String,
                    cuts: Seq[(String, Double)] = Seq(
                      ("train", 0.8), ("val", 0.9), ("test", 1.0))): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 >= 1.0,
      "last cut must cover the [0,1) fraction space")
    val f = hashFrac(col(groupCol))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, ub), rest) => when(f < lit(ub), lit(name)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Deterministic stratified sampler — the data-mixing stage: keep a
    * row iff its salted hash fraction falls below its stratum's rate
    * (e.g. downsample boilerplate-heavy sources, upweight rare
    * languages by keeping them whole). Content-addressed like
    * [[assign]]: same membership on every run, cluster size, and
    * repartition — and the `salt` decorrelates sampling from split
    * assignment (the same doc's split fraction and sample fraction are
    * independent hashes). Strata absent from `rates` keep
    * `defaultRate`. Pure narrow filter — no shuffle, scale-free. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0,
                       salt: String = "sample"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0) &&
      defaultRate >= 0.0 && defaultRate <= 1.0,
      "sample rates must be in [0, 1]")
    val f = hashFrac(concat(col(idCol).cast("string"), lit(":" + salt)))
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((k, v), rest) =>
        when(col(stratumCol) === lit(k), lit(v)).otherwise(rest)
    }
    df.filter(f < rate)
  }

  /** Temperature-weighted source mixing — the data-mixing stage in its
    * standard parameterization: target per-source mass ∝ n_s^alpha
    * (alpha < 1 flattens the natural distribution toward uniform, the
    * multilingual/multi-domain rebalancing move). With keep-only
    * sampling (no duplication) that means per-source keep rate
    * r_s = (n_min / n_s)^(1-alpha), normalized so the SMALLEST source
    * keeps everything and larger sources downsample toward the
    * flattened shares. Membership is content-addressed like [[assign]]
    * (salted md5 fraction < r_s): stable across runs and partitioning.
    *
    * alpha = 0.5 routes through `sqrt` (IEEE-exact, engine-portable —
    * the oracle-gated configuration); other alphas use `pow` (correct
    * to ~1 ulp, fine for mixing, not hash-gated). Scale shape: one
    * tiny per-source count aggregate broadcast back onto the corpus —
    * the corpus itself never shuffles.
    */
  def mixByTemperature(df: DataFrame, idCol: String, sourceCol: String,
                       alpha: Double = 0.5,
                       salt: String = "mix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_src"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("n_src")).as("n_min"))))
    val ratio = col("n_min").cast("double") / col("n_src").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, lit(1.0 - alpha))
    val rates = withMin.select(col(sourceCol), rate.as("mix_rate"))
    val f = hashFrac(concat(col(idCol).cast("string"), lit(":" + salt)))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(f < col("mix_rate"))
  }

  /** Per-group quality calibration — the prerequisite of "keep the top
    * X% of each source": raw quality scores are not comparable across
    * sources (a mid-tier news article outscores the best forum post on
    * most heuristics), so thresholds must be per-group quantiles, not
    * global cuts. Emits each row's within-group `q_rank`
    * (percent_rank: ties share a rank — engine-identical semantics)
    * and its decile-style `q_bucket` in [0, buckets). Filtering
    * `q_bucket >= b` then keeps the same FRACTION of every group.
    *
    * Scale shape: one window sort per group lane — groups are the
    * partition key, so the sort is per-source and parallel (never a
    * global single-partition window); the score column should be a
    * cheap scalar, computed upstream. */
  def calibratePerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                        buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol))
    df.withColumn("q_rank", percent_rank().over(w))
      .withColumn("q_bucket",
        least(floor(col("q_rank") * lit(buckets)), lit(buckets - 1))
          .cast("int"))
  }

  /** Train/test contamination audit — the eval-integrity operator:
    * near-dup PAIRS (from any pair generator in [[Dedup]]) that
    * straddle a split boundary. A benchmark answer leaking into train
    * as a near-duplicate is exactly such a pair; a clean corpus
    * returns zero rows. Two id equi-joins against the (takedown-sized
    * relative to the corpus) pair frame — the split frame never
    * self-joins. Unordered like the [[Dedup]] pair generators —
    * ordering is the caller's. */
  def crossSplitPairs(pairs: DataFrame, aCol: String, bCol: String,
                      splits: DataFrame, idCol: String): DataFrame = {
    val sp = splits.select(col(idCol).cast("long"), col("split"))
    pairs
      .join(sp.withColumnRenamed(idCol, aCol).withColumnRenamed("split", "split_a"), aCol)
      .join(sp.withColumnRenamed(idCol, bCol).withColumnRenamed("split", "split_b"), bCol)
      .filter(col("split_a") =!= col("split_b"))
      .select(col(aCol), col(bCol), col("split_a"), col("split_b"))
  }

  /** Token-budget sequence packing over a PRECOMPUTED per-doc count —
    * the pluggable-counter face of packing: any counter (whitespace
    * tokens, trained BPE/Unigram SUBWORDS, characters) produces an
    * (id, count) frame and this stage bins it. Within each (split,
    * shard) lane, docs pack greedily in id order — bin =
    * exclusive-prefix-sum of counts over the lane, integer-divided by
    * `budget` (so a bin holds docs until their combined tokens cross
    * the budget; one doc may straddle, the standard drop-or-truncate
    * point downstream).
    *
    * The lane window is the packing semantics, not an implementation
    * shortcut: packing is inherently a sequential scan, and `shards`
    * bounds that scan to 1/shards of the corpus — lanes run in
    * parallel, each sorted once. At 100 TB pick shards ≈ the cluster's
    * task parallelism; membership stays deterministic because the lane
    * key (id mod shards) and the order (id) are content-addressed, not
    * partition-addressed. */
  def packCounted(counts: DataFrame, idCol: String, countCol: String,
                  budget: Int = 1000, shards: Int = 8,
                  cuts: Seq[(String, Double)] = Seq(
                    ("train", 0.8), ("val", 0.9), ("test", 1.0))): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val withSplit = assign(counts, idCol, cuts)
      .withColumn("shard", pmod(col(idCol).cast("long"), lit(shards.toLong)))
      .withColumn("n_tokens", col(countCol).cast("long"))
    val lane = Window.partitionBy("split", "shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withSplit
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(lane), lit(0L)))
      .withColumn("bin", (col("prior") / lit(budget.toLong)).cast("long"))
      .select(col(idCol), col("split"), col("shard"), col("n_tokens"),
        col("bin"))
  }

  /** [[packCounted]] with the train-free whitespace counter — the
    * estimation-grade default (a real pretrain pipeline budgets by its
    * TRAINED tokenizer's subwords: [[packSubwords]]). */
  def packTokens(docs: DataFrame, idCol: String, textCol: String,
                 budget: Int = 1000, shards: Int = 8,
                 cuts: Seq[(String, Double)] = Seq(
                   ("train", 0.8), ("val", 0.9), ("test", 1.0))): DataFrame =
    packCounted(
      docs.select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("__n_ws")),
      idCol, "__n_ws", budget, shards, cuts)

  /** [[packCounted]] under a TRAINED unigram tokenizer — the budget a
    * pretrain pipeline actually packs by is subwords of the tokenizer
    * it will train with, not whitespace tokens (a CJK or code-heavy
    * doc is several subwords per "word"; budgeting by whitespace
    * over-packs it). Counting is [[Unigram.subwordCounts]]: one narrow
    * Viterbi map with the vocab broadcast, then the same lane window —
    * the whole stage adds zero extra shuffles over [[packTokens]]. */
  def packSubwords(docs: DataFrame, idCol: String, textCol: String,
                   pieces: Array[Unigram.Piece],
                   budget: Int = 1000, shards: Int = 8,
                   cuts: Seq[(String, Double)] = Seq(
                     ("train", 0.8), ("val", 0.9), ("test", 1.0))): DataFrame =
    packCounted(
      Unigram.subwordCounts(docs, idCol, textCol, pieces)
        .withColumnRenamed("id", idCol),
      idCol, "n_subwords", budget, shards, cuts)

  /** [[packSubwords]] for a trained BPE merge table. */
  def packSubwordsBpe(docs: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)],
                      budget: Int = 1000, shards: Int = 8,
                      cuts: Seq[(String, Double)] = Seq(
                        ("train", 0.8), ("val", 0.9), ("test", 1.0))): DataFrame =
    packCounted(
      Bpe.subwordCounts(docs, idCol, textCol, merges)
        .withColumnRenamed("id", idCol),
      idCol, "n_subwords", budget, shards, cuts)

  /** Temperature mixing by a WEIGHT column instead of doc count — the
    * subword-budget face of [[mixByTemperature]]: per-source mass is
    * Σ weight (e.g. trained-tokenizer subword counts, the mass a
    * pretrain mixture actually balances), so keep rate r_s =
    * (w_min / w_s)^(1−alpha) — token-weighted temperature flattening.
    * Same scale shape: one tiny per-source aggregate broadcast back;
    * the corpus never shuffles. alpha = 0.5 routes through `sqrt`
    * (IEEE-exact, oracle-gated); membership is content-addressed. */
  def mixByTemperatureWeighted(df: DataFrame, idCol: String,
                               sourceCol: String, weightCol: String,
                               alpha: Double = 0.5,
                               salt: String = "mix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(sourceCol))
      .agg(sum(col(weightCol).cast("long")).as("w_src"))
    // w_min over POSITIVE-mass sources only: one pathological zero-mass
    // source would otherwise set w_min = 0, zero every rate, and filter
    // out the ENTIRE corpus. Zero-mass sources themselves keep rate 1
    // below — their docs consume no token budget, so flattening has
    // nothing to shave.
    val withMin = counts.crossJoin(
      broadcast(counts.filter(col("w_src") > 0)
        .agg(min(col("w_src")).as("w_min"))))
    val ratio = col("w_min").cast("double") / col("w_src").cast("double")
    val rate0 =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, lit(1.0 - alpha))
    val rate = when(col("w_src") <= 0, lit(1.0)).otherwise(rate0)
    val rates = withMin.select(col(sourceCol), rate.as("mix_rate"))
    val f = hashFrac(concat(col(idCol).cast("string"), lit(":" + salt)))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(f < col("mix_rate"))
  }

  /** Deterministic weighted sample of exactly k rows — priority
    * sampling (Duffield–Lund–Thorup, JACM 2007): each row draws a
    * content-addressed uniform u ∈ (0,1] (the salted md5 fraction of
    * [[assign]], +1 in the numerator so u is never 0) and gets
    * priority q = w/u; the k highest priorities are the sample, with
    * ids breaking exact ties. Alongside each kept row the unbiased
    * subset-sum estimator `est_w` = max(w, τ), where the threshold τ
    * is the (k+1)-th priority: Σ est_w over any subset of the sample
    * estimates that subset's true total weight — the property that
    * lets a k-row sample audit per-source token mass on the full
    * corpus (SplitsSpec gates estimator totals).
    *
    * Engine-portability: u is exact in a double, q is one IEEE
    * division, τ a comparison — all bit-identical across engines, so
    * the selected set and estimator are oracle-checkable. Scale
    * shape: one narrow map + TakeOrdered(k+1) (per-partition top-k
    * heaps, driver merges 32 heaps of k+1 rows) + a 1-row broadcast
    * of τ — the corpus never shuffles, k bounds driver memory.
    */
  def sampleWeightedTopK(df: DataFrame, idCol: String, weightCol: String,
                         k: Int, salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val top = df.withColumn("__priority", priorityOf(idCol, weightCol, salt))
      .orderBy(col("__priority").desc, col(idCol))
      .limit(k + 1)
      .localCheckpoint(true) // one TakeOrdered pass feeds τ AND the sample
    finishSample(top, idCol, weightCol, k)
  }

  /** The priority-sampling coordinate q = w/u: content-addressed
    * uniform u ∈ (0,1] (salted md5 fraction, +1 so u is never 0), one
    * IEEE division — bit-portable across engines and batch/stream. */
  private[graft] def priorityOf(idCol: String, weightCol: String,
                                salt: String): Column =
    col(weightCol).cast("double") / (
      (conv(substring(md5(concat(col(idCol).cast("string"),
          lit(":" + salt))), 1, 8), 16, 10).cast("double") + lit(1.0)) /
        lit(4294967296.0))

  /** Per-group weighted sampling — [[sampleWeightedTopK]] run
    * independently inside every value of `groupCol` (the stratified
    * face: k docs per source/language weighted by quality or length,
    * each group carrying its own threshold τ and unbiased estimator).
    * One hash-partition-by-group exchange + a window rank — the rows
    * that cross the wire are the corpus' (id, w, group) triples, never
    * content. Groups smaller than k keep everything with est_w = w
    * (their rank-(k+1) τ is null), exactly like the global operator on
    * a small corpus. */
  def sampleWeightedPerGroup(df: DataFrame, idCol: String,
                             weightCol: String, groupCol: String,
                             k: Int, salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__priority").desc, col(idCol))
    // materialize the groups×(k+1) survivors once: τ and the sample
    // both read this frame, and without the checkpoint each would
    // re-run the corpus-wide window exchange
    val ranked = df
      .withColumn("__priority", priorityOf(idCol, weightCol, salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k + 1)
      .localCheckpoint(true)
    val taus = ranked.filter(col("__rn") === k + 1)
      .select(col(groupCol), col("__priority").as("__tau"))
    ranked.filter(col("__rn") <= k)
      .join(broadcast(taus), Seq(groupCol), "left")
      .withColumn("est_w",
        when(col("__tau").isNull, col(weightCol).cast("double"))
          .otherwise(greatest(col(weightCol).cast("double"), col("__tau"))))
      .drop("__priority", "__rn", "__tau")
  }

  /** Turn a top-(k+1)-by-`__priority` frame into the final sample:
    * τ = the (k+1)-th priority iff k+1 rows exist, else null (input
    * smaller than k: everything kept, estimator = true weight). Shared
    * by the batch operator above and the streaming state's read-out
    * ([[graft.streaming.Streaming.weightedSampleOf]] — the stream
    * keeps exactly this top-(k+1) frame as its whole state). */
  private[graft] def finishSample(top: DataFrame, idCol: String,
                                  weightCol: String, k: Int): DataFrame = {
    val tau = top.agg(
      when(count(lit(1)) === k + 1, min(col("__priority")))
        .as("__tau"))
    top.crossJoin(broadcast(tau))
      .orderBy(col("__priority").desc, col(idCol))
      .limit(k)
      .withColumn("est_w",
        when(col("__tau").isNull, col(weightCol).cast("double"))
          .otherwise(greatest(col(weightCol).cast("double"), col("__tau"))))
      .drop("__priority", "__tau")
  }
}
