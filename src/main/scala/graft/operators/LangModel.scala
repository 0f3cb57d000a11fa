package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring (beyond the reference
  * surface — the CCNet-style "does this read like the corpus" quality
  * signal: score each document by the average probability its own
  * corpus's bigram statistics assign to its word transitions; degenerate
  * or machine-generated text scores low against in-domain statistics).
  *
  * Probability model: add-one-smoothed bigram likelihood
  * `p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)` with V = distinct-unigram
  * vocabulary size. Scores stay in PROBABILITY space quantized to 1e-9
  * fixed-point BIGINTs before summation — no libm (`ln`/`pow`) in the
  * scored output, so per-doc sums are exact, order-independent, and
  * engine-portable (the repo's hash-portability contract; a log-space
  * score would ride on `ln`'s 1-ulp engine variance for every bigram).
  *
  * Scale shape: token explode → two equi-joins against the count
  * tables → per-doc sum. The bigram/unigram count tables are
  * Zipf-distributed corpus statistics — orders of magnitude smaller
  * than the corpus occurrence stream they aggregate; both joins key on
  * the gram hash, so shuffles are posting-list-sized, and the final
  * per-doc aggregate exchanges two counters per doc. Training and
  * scoring are one pass each over the corpus; nothing collects to the
  * driver.
  */
object LangModel {

  /** Fixed-point scale for quantized probabilities: 1e-9 resolution
    * holds ~9 significant digits of a [0,1] probability in a BIGINT —
    * one double multiply + floor, bit-identical on both engines.
    */
  val ProbScale = 1000000000L

  /** Per-document bigram occurrence stream: (id, w1, w2), one row per
    * adjacent token pair, duplicates kept (scoring weights repeated
    * transitions). Two-step select keeps the transform lambda on a
    * bound attribute (round-7 HOF discipline).
    */
  private[graft] def bigrams(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
          .as("bgs"))
      .select(col(idCol), explode_outer(col("bgs")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train the model on a corpus: returns (unigramCounts(w1, c1),
    * bigramCounts(w1, w2, c2), vocabSize). Unigram counts are COUNTS
    * OF BIGRAM LEFT CONTEXTS (c(w1·) = Σ_w2 c(w1,w2)), the classical
    * conditional-probability denominator, so probabilities normalize:
    * Σ_w2 p(w2|w1) = 1 exactly.
    */
  def train(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, Long) = {
    val bg = bigrams(docs, idCol, textCol).filter(col("w1").isNotNull)
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val uni = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    (uni, big, vocab)
  }

  /** Score each document against trained counts: `n_bigrams` and
    * `score_q` = Σ floor(p(w2|w1)·1e9 + 0.5) over its transitions
    * (quantized-mean probability = score_q / n_bigrams / 1e9).
    * Documents with no bigram (≤1 token) report 0/0.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            uni: DataFrame, big: DataFrame, vocab: Long): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val pQ = floor(
      ((coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)).cast("double") + lit(vocab.toDouble)))
        * lit(ProbScale.toDouble) + lit(0.5)).cast("long")
    bg
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .select(col(idCol), when(col("w1").isNotNull, pQ).as("p_q"))
      .groupBy(col(idCol))
      .agg(count(col("p_q")).as("n_bigrams"),
        coalesce(sum(col("p_q")), lit(0L)).as("score_q"))
  }

  /** Train-on-self convenience: the in-domain quality signal. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (uni, big, v) = train(docs, idCol, textCol)
    score(docs, idCol, textCol, uni, big, v)
  }

  /** Absolute discount for the Kneser–Ney path (the standard fixed
    * value; Chen & Goodman's count-of-counts estimate lands near it on
    * natural text). */
  val KnDiscount = 0.75

  /** Train interpolated Kneser–Ney bigram statistics — the smoothing
    * family the CCNet/KenLM perplexity filters actually use (Kneser &
    * Ney 1995; Chen & Goodman 1999), fixing add-one's two failure
    * modes: it discounts mass by a constant D instead of drowning rare
    * contexts in +1s, and its backoff weights a word by HOW MANY
    * CONTEXTS it completes (the continuation count N1+(·w2)), not raw
    * frequency — so "Francisco" (frequent, one context) stops looking
    * like a plausible continuation everywhere.
    *
    * Returns (uni(w1, c1, nf), big(w1, w2, c2), cont(w2, np), T):
    * c1 = Σ_w2 c(w1,w2), nf = N1+(w1·) distinct followers,
    * np = N1+(·w2) distinct predecessors, T = distinct bigram types.
    * All three frames aggregate off the bigram-type table — corpus
    * statistics, orders of magnitude below the occurrence stream. */
  def trainKN(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, Long) = {
    val bg = bigrams(docs, idCol, textCol).filter(col("w1").isNotNull)
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true) // three aggregates + T read one materialization
    val uni = big.groupBy("w1")
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("nf"))
    val cont = big.groupBy("w2").agg(count(lit(1)).as("np"))
    (uni, big, cont, big.count())
  }

  /** Score documents under interpolated Kneser–Ney:
    * p(w2|w1) = max(c2 − D, 0)/c1 + (D·nf/c1)·(np/T), backing off to
    * the continuation probability np/T alone when w1 is an unseen
    * context. Same 1e-9 fixed-point quantization, output schema, and
    * posting-list join shape as [[score]] (one extra tiny join on the
    * continuation table); every double step is one IEEE op in a
    * pinned order, replayed verbatim by the lm_kn_score oracle. */
  def scoreKN(docs: DataFrame, idCol: String, textCol: String,
              uni: DataFrame, big: DataFrame, cont: DataFrame,
              tTypes: Long): DataFrame = {
    require(tTypes > 0, "scoreKN needs a non-empty training corpus")
    val bg = bigrams(docs, idCol, textCol)
    val pCont = coalesce(col("np").cast("double"), lit(0.0)) /
      lit(tTypes.toDouble)
    val pSeen =
      greatest(coalesce(col("c2"), lit(0L)).cast("double") - lit(KnDiscount),
        lit(0.0)) / col("c1").cast("double") +
      ((lit(KnDiscount) * col("nf").cast("double")) /
        col("c1").cast("double")) * pCont
    val p = when(col("c1").isNull, pCont).otherwise(pSeen)
    val pQ = floor(p * lit(ProbScale.toDouble) + lit(0.5)).cast("long")
    bg
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .select(col(idCol), when(col("w1").isNotNull, pQ).as("p_q"))
      .groupBy(col(idCol))
      .agg(count(col("p_q")).as("n_bigrams"),
        coalesce(sum(col("p_q")), lit(0L)).as("score_q"))
  }

  /** Train-on-self Kneser–Ney — [[selfScore]]'s KN twin. */
  def selfScoreKN(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val (uni, big, cont, t) = trainKN(docs, idCol, textCol)
    scoreKN(docs, idCol, textCol, uni, big, cont, t)
  }

  /** Per-document trigram occurrence stream: (id, w1, w2, w3). */
  private[graft] def trigrams(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2"),
              element_at(col("toks"), i + 3).as("w3"))))
          .otherwise(array()
            .cast("array<struct<w1:string,w2:string,w3:string>>"))
          .as("tgs"))
      .select(col(idCol), explode_outer(col("tgs")).as("tg"))
      .select(col(idCol), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))

  /** Trained trigram-KN statistics. Every frame is a TYPE-table
    * aggregate (Zipf-small): `tri(w1,w2,w3,c3)` raw counts;
    * `ctx(w1,w2,c12,nf12)` context totals + N1+(w1w2·);
    * `mid(w2,w3,n1c)` = N1+(·w2w3) distinct left contexts;
    * `midCtx(w2,n1c2,nf2c)` = N1+(·w2·) + distinct followers of w2;
    * `cont(w3,np)` = N1+(·w3) over BIGRAM types; `t2` = bigram types. */
  case class KN3(tri: DataFrame, ctx: DataFrame, mid: DataFrame,
                 midCtx: DataFrame, cont: DataFrame, t2: Long)

  /** Train the full interpolated Kneser–Ney trigram chain (Chen &
    * Goodman's formulation — the KenLM shape the CCNet filter runs,
    * at n=3): the top order discounts RAW counts; every lower order
    * is estimated from CONTINUATION (type) counts of the order above,
    * not raw frequency — the property that keeps frequent-but-
    * context-bound words from inflating backoff mass. */
  def trainKN3(docs: DataFrame, idCol: String, textCol: String): KN3 = {
    val tg = trigrams(docs, idCol, textCol).filter(col("w1").isNotNull)
    val tri = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      .localCheckpoint(true)
    val ctx = tri.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("c12"), count(lit(1)).as("nf12"))
    val mid = tri.groupBy("w2", "w3").agg(count(lit(1)).as("n1c"))
      .localCheckpoint(true)
    val midCtx = mid.groupBy("w2")
      .agg(sum(col("n1c")).as("n1c2"), count(lit(1)).as("nf2c"))
    val b2 = bigrams(docs, idCol, textCol).filter(col("w1").isNotNull)
      .select("w1", "w2").distinct().localCheckpoint(true)
    val cont = b2.groupBy("w2").agg(count(lit(1)).as("np"))
      .withColumnRenamed("w2", "w3")
    KN3(tri, ctx, mid, midCtx, cont, b2.count())
  }

  /** Score documents under the interpolated KN trigram chain:
    * p3 = max(c3−D,0)/c12 + (D·nf12/c12)·p2
    * p2 = max(N1+(·w2w3)−D,0)/N1+(·w2·) + (D·nf2c/N1+(·w2·))·p1
    * p1 = N1+(·w3)/T2,
    * each level backing off one step when its context is unseen.
    * Output (id, n_trigrams, score_q) on the [[score]] fixed-point
    * contract; ≤2-token documents report 0/0. Join shape: the
    * occurrence stream against five type tables, all posting-sized. */
  def scoreKN3(docs: DataFrame, idCol: String, textCol: String,
               m: KN3): DataFrame = {
    require(m.t2 > 0, "scoreKN3 needs a non-empty training corpus")
    val tg = trigrams(docs, idCol, textCol)
    val dD = lit(KnDiscount)
    val p1 = coalesce(col("np").cast("double"), lit(0.0)) /
      lit(m.t2.toDouble)
    val p2 = when(col("n1c2").isNull, p1).otherwise(
      greatest(coalesce(col("n1c"), lit(0L)).cast("double") - dD,
        lit(0.0)) / col("n1c2").cast("double") +
      ((dD * col("nf2c").cast("double")) /
        col("n1c2").cast("double")) * p1)
    val p3 = when(col("c12").isNull, p2).otherwise(
      greatest(coalesce(col("c3"), lit(0L)).cast("double") - dD,
        lit(0.0)) / col("c12").cast("double") +
      ((dD * col("nf12").cast("double")) /
        col("c12").cast("double")) * p2)
    val pQ = floor(p3 * lit(ProbScale.toDouble) + lit(0.5)).cast("long")
    tg
      .join(m.tri, Seq("w1", "w2", "w3"), "left")
      .join(m.ctx, Seq("w1", "w2"), "left")
      .join(m.mid, Seq("w2", "w3"), "left")
      .join(m.midCtx, Seq("w2"), "left")
      .join(m.cont, Seq("w3"), "left")
      .select(col(idCol), when(col("w1").isNotNull, pQ).as("p_q"))
      .groupBy(col(idCol))
      .agg(count(col("p_q")).as("n_trigrams"),
        coalesce(sum(col("p_q")), lit(0L)).as("score_q"))
  }

  /** Train-on-self trigram KN — the n=3 in-domain quality signal. */
  def selfScoreKN3(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    scoreKN3(docs, idCol, textCol, trainKN3(docs, idCol, textCol))
  }
}
