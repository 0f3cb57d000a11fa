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
}
